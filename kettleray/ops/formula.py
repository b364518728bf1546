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


def compile_script(script: str):
    """Multi-statement row script (≙ scriptvalues_mod/ScriptValuesMod.java
    and UserDefinedJavaClass — the config-driven 'write code over fields'
    step). Statements are restricted to ``name = expression`` with the
    same AST whitelist as :func:`compile_formula`; each assigned name is
    visible to later statements and becomes an output column. Returns
    (run, targets) where run(cols_dict) -> dict of assigned arrays."""
    tree = ast.parse(script, mode="exec")
    targets: list[str] = []
    new_body = []
    for stmt in tree.body:
        if not (isinstance(stmt, ast.Assign) and len(stmt.targets) == 1
                and isinstance(stmt.targets[0], ast.Name)):
            raise ValueError(
                "script: only simple `name = expression` statements "
                f"allowed, got {type(stmt).__name__}")
        for node in ast.walk(stmt.value):
            if not isinstance(node, _ALLOWED_NODES):
                raise ValueError(
                    f"script: disallowed syntax {type(node).__name__!r}")
        value = ast.fix_missing_locations(_Vectorize().visit(stmt.value))
        for node in ast.walk(value):
            if isinstance(node, ast.Call):
                if not (isinstance(node.func, ast.Name)
                        and node.func.id in _ALLOWED_FUNCS):
                    raise ValueError(
                        f"script: only {sorted(_ALLOWED_FUNCS)} callable")
        new_body.append(ast.Assign(targets=stmt.targets, value=value))
        if stmt.targets[0].id not in targets:
            targets.append(stmt.targets[0].id)
    mod = ast.fix_missing_locations(ast.Module(body=new_body,
                                               type_ignores=[]))
    code = compile(mod, "<script>", "exec")

    def run(cols: dict) -> dict:
        env = {**_ALLOWED_FUNCS, **cols}
        exec(code, {"__builtins__": {}}, env)   # noqa: S102 — safe:
        # ast-whitelisted assign-only statements, empty builtins
        return {t: np.asarray(env[t]) for t in targets}

    return run, targets


def script_step(ds, script: str, *, outputs: list[str] | None = None):
    """≙ Script values step: run a whitelisted multi-statement script
    over each batch; every assigned variable is appended as a column
    (``outputs`` restricts which). Compiled once per worker closure,
    vectorized numpy per batch — never a per-row interpreter loop."""
    run, targets = compile_script(script)
    keep = targets if outputs is None else list(outputs)
    missing = set(keep) - set(targets)
    if missing:
        raise ValueError(f"script never assigns {sorted(missing)}")
    names = {n.id for n in ast.walk(ast.parse(script, mode="exec"))
             if isinstance(n, ast.Name) and isinstance(n.ctx, ast.Load)
             and n.id not in _ALLOWED_FUNCS}

    def _fn(t: pa.Table) -> pa.Table:
        cols = {}
        for name in names & set(t.column_names):
            col = t[name]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            cols[name] = col.to_numpy(zero_copy_only=False)
        out = run(cols)
        for name in keep:
            arr = pa.array(out[name])
            if name in t.column_names:
                t = t.set_column(t.column_names.index(name), name, arr)
            else:
                t = t.append_column(name, arr)
        return t

    return ds.map_batches(_fn, batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=None)


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
