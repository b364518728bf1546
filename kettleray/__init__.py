"""kettleray — a Ray-Data-native CDC / incremental-ingest engine.

A from-scratch reimagining of Pentaho Kettle (PDI)'s data-processing
capabilities — Merge Rows (diff), Insert/Update, Synchronize After Merge,
Dimension Lookup/Update (SCD2), plus the row-level transform / join /
aggregate step library — as ``ray.data.Dataset`` pipelines over zero-copy
Arrow batches.

Reference semantics: fanyourou/pentaho-kettle (public pentaho/pentaho-kettle
tree); see SURVEY.md for the step-by-step mapping. No code is ported; every
operator is re-expressed Ray-Data-first.
"""

__version__ = "0.1.0"

from kettleray.context import configure_ray_data  # noqa: F401
