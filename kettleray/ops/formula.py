"""Formula step: free-form row expressions, vectorized.

≙ Kettle's Formula plugin and the Janino-compiled expression steps
(janino/Janino.java, UserDefinedJavaClass) — the "write an expression
over fields" surface. Here an expression is parsed ONCE (Python ast,
whitelisted node types only — no attribute access, no subscripts, no
arbitrary calls), compiled, and evaluated per batch on numpy arrays, so
a formula runs at C speed over each block.

Allowed: arithmetic (+ - * / // % **), comparisons, boolean and/or/not,
ternary ``x if c else y``, whitelisted functions (abs, sqrt, log, log10,
exp, floor, ceil, round, minimum, maximum, where, clip), column names,
numeric/string constants.
"""

from __future__ import annotations

import ast

import numpy as np
import pyarrow as pa

_ALLOWED_FUNCS = {
    "abs": np.abs, "sqrt": np.sqrt, "log": np.log, "log10": np.log10,
    "exp": np.exp, "floor": np.floor, "ceil": np.ceil,
    "round": lambda x, n=0: np.round(x, n),
    "minimum": np.minimum, "maximum": np.maximum,
    "where": np.where, "clip": np.clip,
}

_ALLOWED_NODES = (
    ast.Expression, ast.BinOp, ast.UnaryOp, ast.Compare, ast.BoolOp,
    ast.IfExp, ast.Call, ast.Name, ast.Constant, ast.Load,
    ast.Add, ast.Sub, ast.Mult, ast.Div, ast.FloorDiv, ast.Mod, ast.Pow,
    ast.USub, ast.UAdd, ast.Not,
    ast.Eq, ast.NotEq, ast.Lt, ast.LtE, ast.Gt, ast.GtE,
    ast.And, ast.Or,
)


class _Vectorize(ast.NodeTransformer):
    """Rewrite scalar-only syntax into vectorized calls: ``x if c else
    y`` -> ``where(c, x, y)``, ``a and b`` -> ``a & b``, ``not a`` ->
    ``~a`` (so formulas read naturally but run on arrays)."""

    def visit_IfExp(self, node: ast.IfExp):
        self.generic_visit(node)
        return ast.Call(func=ast.Name(id="where", ctx=ast.Load()),
                        args=[node.test, node.body, node.orelse],
                        keywords=[])

    def visit_BoolOp(self, node: ast.BoolOp):
        self.generic_visit(node)
        op = ast.BitAnd() if isinstance(node.op, ast.And) else ast.BitOr()
        out = node.values[0]
        for v in node.values[1:]:
            out = ast.BinOp(left=out, op=op, right=v)
        return out

    def visit_UnaryOp(self, node: ast.UnaryOp):
        self.generic_visit(node)
        if isinstance(node.op, ast.Not):
            return ast.UnaryOp(op=ast.Invert(), operand=node.operand)
        return node


def compile_formula(expr: str):
    """Parse + validate ``expr`` once; returns a callable(columns_dict)
    -> numpy array. Raises ValueError on any non-whitelisted construct."""
    tree = ast.parse(expr, mode="eval")
    for node in ast.walk(tree):
        if not isinstance(node, _ALLOWED_NODES):
            raise ValueError(
                f"formula: disallowed syntax {type(node).__name__!r} "
                f"in {expr!r}")
    tree = ast.fix_missing_locations(_Vectorize().visit(tree))
    for node in ast.walk(tree):
        if not isinstance(node, _ALLOWED_NODES + (ast.BitAnd, ast.BitOr,
                                                  ast.Invert)):
            raise ValueError(
                f"formula: disallowed syntax {type(node).__name__!r} "
                f"in {expr!r}")
        if isinstance(node, ast.Call):
            if not (isinstance(node.func, ast.Name)
                    and node.func.id in _ALLOWED_FUNCS):
                raise ValueError(
                    f"formula: only {sorted(_ALLOWED_FUNCS)} callable")
    code = compile(tree, "<formula>", "eval")

    def run(cols: dict) -> np.ndarray:
        env = {**_ALLOWED_FUNCS, **cols}
        return eval(code, {"__builtins__": {}}, env)   # noqa: S307 —
        # safe: ast-whitelisted nodes only, empty builtins

    return run


def formula(ds, out_col: str, expr: str, *, round_to: int | None = None):
    """Append ``out_col`` = vectorized evaluation of ``expr`` over the
    row's fields (≙ Formula step). Expression compiled once per worker
    closure, applied per batch with numpy kernels."""
    run = compile_formula(expr)
    names = {n.id for n in ast.walk(ast.parse(expr, mode="eval"))
             if isinstance(n, ast.Name) and n.id not in _ALLOWED_FUNCS}

    def _fn(t: pa.Table) -> pa.Table:
        cols = {}
        for name in names:
            col = t[name]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            cols[name] = col.to_numpy(zero_copy_only=False)
        out = run(cols)
        out = np.asarray(out)
        if round_to is not None:
            out = np.round(out, round_to)
        return t.append_column(out_col, pa.array(out))

    return ds.map_batches(_fn, batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=None)
