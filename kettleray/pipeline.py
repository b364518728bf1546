"""Pipeline composition: operator registry + config-driven builder.

≙ Kettle's plugin registry (PluginRegistry/StepPluginType — steps
discovered by name), TransMeta (the declared DAG), and ETL Metadata
Injection (metainject/MetaInject.java — building a transformation from
config data). Here a pipeline is data: a list of {op, args} step dicts
applied left-to-right to a Dataset; operators are plain functions
``(Dataset, **args) -> Dataset`` registered by name. Sub-pipelines
(≙ Mapping / Trans-Executor) are just nested pipeline specs.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Mapping, Sequence

import ray.data

Operator = Callable[..., "ray.data.Dataset"]

_REGISTRY: dict[str, Operator] = {}


def register(name: str, fn: Operator | None = None):
    """Register an operator by name (decorator or direct call)."""
    if fn is not None:
        _REGISTRY[name] = fn
        return fn

    def deco(f):
        _REGISTRY[name] = f
        return f
    return deco


def get_operator(name: str) -> Operator:
    if name not in _REGISTRY:
        raise KeyError(f"unknown operator {name!r}; known: "
                       f"{sorted(_REGISTRY)}")
    return _REGISTRY[name]


def operators() -> list[str]:
    return sorted(_REGISTRY)


@dataclass
class Pipeline:
    """A declared chain of registered operators over one input Dataset."""
    steps: Sequence[Mapping[str, Any]] = field(default_factory=list)

    def run(self, ds: "ray.data.Dataset",
            metrics: "Any | None" = None) -> "ray.data.Dataset":
        """Apply the declared steps left-to-right. With ``metrics`` (a
        :class:`kettleray.metrics.PipelineMetrics`), a zero-copy
        pass-through counter is spliced after the input and after every
        step — Kettle's BaseStep linesRead/linesWritten counters; read
        them via ``metrics.step_status()`` after execution. Steps may
        carry an optional ``"name"`` (Kettle step names) used for the
        counter label; default is ``{i}:{op}``."""
        if metrics is not None:
            ds = metrics.count(ds, "input")
        for i, step in enumerate(self.steps):
            op = get_operator(step["op"])
            ds = op(ds, **{k: v for k, v in step.items()
                           if k not in ("op", "name")})
            if metrics is not None:
                ds = metrics.count(ds, step.get("name",
                                                f"{i}:{step['op']}"))
        return ds

    @staticmethod
    def from_config(cfg: Sequence[Mapping[str, Any]],
                    variables: Mapping[str, Any] | None = None,
                    ) -> "Pipeline":
        """≙ Metadata injection: a pipeline built from plain data.
        ``variables`` enables ``${VAR}`` substitution (≙ Kettle's
        core/.../variables/Variables.java environmentSubstitute) in every
        string value of the spec; a string that is EXACTLY "${VAR}" is
        replaced by the variable's native value (int/float/list survive),
        otherwise standard string templating applies."""
        if variables:
            cfg = _substitute(cfg, dict(variables))
        return Pipeline(steps=list(cfg))

    @staticmethod
    def from_json(path: str,
                  variables: Mapping[str, Any] | None = None,
                  ) -> "Pipeline":
        """≙ loading a .ktr: a declared pipeline from a JSON spec file
        (a list of {"op": ..., ...} step objects) with optional ``${VAR}``
        substitution."""
        import json
        with open(path) as f:
            cfg = json.load(f)
        if not isinstance(cfg, list):
            raise ValueError("pipeline spec must be a JSON list of steps")
        return Pipeline.from_config(cfg, variables=variables)


def _substitute(node: Any, variables: Mapping[str, Any]) -> Any:
    """Recursive ${VAR} substitution over a JSON-shaped spec. Unknown
    variables raise KeyError (fail loudly, like Kettle's strict mode)."""
    import re
    if isinstance(node, str):
        m = re.fullmatch(r"\$\{([A-Za-z_][A-Za-z0-9_]*)\}", node)
        if m:                      # whole-string ref: keep native type
            return variables[m.group(1)]
        # ONLY ${VAR} is special (Kettle syntax): literal '$' (regexes,
        # currency text) and bare $NAME pass through untouched; unknown
        # ${VAR} still raises KeyError (strict mode)
        return re.sub(r"\$\{([A-Za-z_][A-Za-z0-9_]*)\}",
                      lambda mm: str(variables[mm.group(1)]), node)
    if isinstance(node, Mapping):
        return {k: _substitute(v, variables) for k, v in node.items()}
    if isinstance(node, (list, tuple)):
        return [_substitute(v, variables) for v in node]
    return node


def _register_builtins() -> None:
    from kettleray.ops import aggregates as ag
    from kettleray.ops import cdc, dedup, rowops, skew, strings, textstats
    from kettleray.ops.formula import formula, script_step

    register("formula", formula)
    register("script_values", script_step)
    register("parse_validate", cdc.parse_validate)
    register("replay_lww", cdc.replay_lww)
    register("scd2_history", cdc.scd2_history)
    register("replay_lww_salted", skew.replay_lww_salted)
    register("scd2_history_salted", skew.scd2_history_salted)
    register("select_values", rowops.select_values)
    register("filter_rows", rowops.filter_rows)
    register("switch_case", rowops.switch_case)
    register("add_constants", rowops.add_constants)
    register("value_mapper", rowops.value_mapper)
    register("if_null", rowops.if_null)
    register("null_if", rowops.null_if)
    register("number_range", rowops.number_range)
    register("clone_row", rowops.clone_row)
    register("checksum", rowops.checksum)
    register("string_operations", strings.string_operations)
    register("strings_cut", strings.strings_cut)
    register("replace_in_string", strings.replace_in_string)
    register("split_fields", strings.split_fields)
    register("split_field_to_rows", strings.split_field_to_rows)
    register("concat_fields", strings.concat_fields)
    register("regex_eval", strings.regex_eval)
    register("group_by", ag.group_by)
    register("unique_rows", ag.unique_rows)
    register("sort_rows", ag.sort_rows)
    register("top_k", ag.top_k)
    register("analytic_query", ag.analytic_query)
    register("fields_change_sequence", ag.fields_change_sequence)
    register("sessionize", ag.sessionize)
    register("row_normaliser", rowops.row_normaliser)
    register("row_denormaliser", rowops.row_denormaliser)
    register("data_validator", rowops.data_validator)
    register("replay_lww_twopass", cdc.replay_lww_twopass)
    register("evolve_to_schema", cdc.evolve_to_schema)
    register("diff_snapshots", cdc.diff_snapshots)
    register("token_count", textstats.token_count)
    register("text_quality", textstats.text_quality)
    register("doc_fingerprint", textstats.doc_fingerprint)
    register("lang_id", textstats.lang_id)
    register("exact_dedup", dedup.exact_dedup)
    register("simhash", dedup.simhash)
    register("calculator", _calculator_from_spec)
    register("top_k_per_group", ag.top_k_per_group)
    register("mixture_sample", ag.mixture_sample)
    register("stratified_sample", ag.stratified_sample)
    register("compact_changelog", cdc.compact_changelog)
    register("split_on_watermark", cdc.split_on_watermark)
    register("paragraph_dedup", dedup.paragraph_dedup)
    register("dedup_corpus", dedup.dedup_corpus)
    register("scrub_text", textstats.scrub_text)
    register("normalize_text", textstats.normalize_text)
    register("repetition_stats", textstats.repetition_stats)
    register("dummy", rowops.dummy)
    register("write_to_log", rowops.write_to_log)
    register("delay", rowops.delay)
    register("abort_after", rowops.abort_after)

    def _lsh_probe(ds, *, root, **kw):
        from kettleray.ops import incdedup
        return incdedup.probe_lsh(root, ds, **kw)

    register("lsh_probe", _lsh_probe)

    def _widen_strings(ds, *, cols=("content",)):
        return ds.map_batches(
            lambda t: cdc.widen_strings(t, tuple(cols)),
            batch_format="pyarrow", zero_copy_batch=True)

    register("widen_strings", _widen_strings)

    def _ann_commit(ds, *, root, **kw):
        """Commit the stream into an incremental ANN index (ops/incann)
        and pass the input through (sink-style step; the input is
        materialized once so downstream steps don't re-execute it)."""
        from kettleray.ops import incann
        ds = ds.materialize()
        incann.apply_incremental_ann(root, ds, **kw)
        return ds

    register("ann_commit", _ann_commit)

    def _inverted_commit(ds, *, root, **kw):
        """Commit the stream into an incremental inverted text index
        (ops/incinv) and pass the input through (sink-style step)."""
        from kettleray.ops import incinv
        ds = ds.materialize()
        incinv.apply_incremental_inverted(root, ds, **kw)
        return ds

    register("inverted_commit", _inverted_commit)
    from kettleray.ops.formula import formula
    register("formula", formula)
    register("sub_pipeline", _sub_pipeline)


def _sub_pipeline(ds, steps, variables=None):
    """≙ Mapping (reusable sub-transformation) / Trans-Executor: run a
    nested pipeline spec inline, with its own optional ``${VAR}``
    bindings. Nesting composes arbitrarily (a sub-spec may itself
    contain sub_pipeline steps)."""
    return Pipeline.from_config(steps, variables=variables).run(ds)


def _calculator_from_spec(ds, ops):
    """Config-shaped calculator: ops as plain dicts (metadata-injection
    friendly), converted to CalcOp."""
    from kettleray.ops.calculator import CalcOp, calculator
    return calculator(ds, [CalcOp(**o) for o in ops])


_register_builtins()
