"""Per-record schema validation (reference: ``Index::validate_index_in_memory``,
``src/index.cpp:249-352``): each document is checked against a declared
schema; failures produce a per-record error (the batch is NOT aborted),
mirroring the reference's per-line import results
(``src/collection.cpp:357-371``).

Ray shape: a stateless vectorized ``map_batches`` stage that splits a
batch into (valid rows, reject rows+error strings). ``build_index`` can
run it up front and write rejects next to the segments.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa


@dataclass(frozen=True)
class FieldSpec:
    """Declared field (reference ``include/field.h:28-98``): name, type in
    {'string','int32','int64','float','bool','string[]','int32[]',
    'int64[]','float[]','bool[]'}, facet + optional flags."""

    name: str
    type: str
    facet: bool = False
    optional: bool = False


VALID_FIELD_TYPES = frozenset(
    {"string", "int32", "int64", "float", "bool",
     "string[]", "int32[]", "int64[]", "float[]", "bool[]"}
)

# reference type-mismatch article+noun forms
# (``src/index.cpp:280-346`` validate_index_in_memory)
_TYPE_ERR = {
    "string": "a string", "int32": "an int32", "int64": "an int64",
    "float": "a float", "bool": "a bool",
    "string[]": "a string array", "int32[]": "an int32 array",
    "int64[]": "an int64 array", "float[]": "a float array",
    "bool[]": "a bool array",
}


def type_error(name: str, ftype: str) -> str:
    return f"Field `{name}` must be {_TYPE_ERR[ftype]}."


_SCALAR_OK = {
    "string": lambda v: isinstance(v, str),
    "int32": lambda v: isinstance(v, int) and not isinstance(v, bool)
    and -(2**31) <= v < 2**31,
    # int64 is range-bounded like int32: a Python int beyond int64 would
    # pass an unbounded check and then OverflowError inside pa.array()
    # mid-commit (the reference's nlohmann parser stores such numbers as
    # double, failing is_number_integer the same way)
    "int64": lambda v: isinstance(v, int) and not isinstance(v, bool)
    and -(2**63) <= v < 2**63,
    "float": lambda v: isinstance(v, (int, float)) and not isinstance(v, bool),
    "bool": lambda v: isinstance(v, bool),
}


def _check(value, ftype: str) -> bool:
    if ftype.endswith("[]"):
        inner = ftype[:-2]
        return isinstance(value, list) and all(_SCALAR_OK[inner](v) for v in value)
    return _SCALAR_OK[ftype](value)


def validate_batch(
    batch: pa.Table, schema: list[FieldSpec]
) -> tuple[pa.Table, pa.Table]:
    """Returns (valid_rows, rejects) where rejects carry an ``error``
    column naming the first offending field — one error per record, the
    rest of the batch proceeds (src/index.cpp:270-350 behavior)."""
    n = batch.num_rows
    errors: list[str | None] = [None] * n
    cols = {f.name: batch[f.name].to_pylist() if f.name in batch.column_names
            else [None] * n for f in schema}
    for i in range(n):
        for f in schema:
            v = cols[f.name][i]
            if v is None:
                if not f.optional:
                    errors[i] = f"Field `{f.name}` has been declared in the schema, but is not found in the document."
                    break
                continue
            if not _check(v, f.type):
                errors[i] = type_error(f.name, f.type)
                break
    mask = np.array([e is None for e in errors], dtype=bool)
    valid = batch.filter(pa.array(mask))
    rejects = batch.filter(pa.array(~mask)).append_column(
        "error", pa.array([e for e in errors if e is not None], pa.string())
    )
    return valid, rejects


class Validator:
    """map_batches stage emitting only valid rows, spilling rejects (with
    errors) to a side parquet directory — the per-line import result
    stream, made durable."""

    def __init__(self, schema: list[FieldSpec], rejects_dir: str | None = None):
        self.schema = schema
        self.rejects_dir = rejects_dir
        if rejects_dir:
            import os

            os.makedirs(rejects_dir, exist_ok=True)

    def __call__(self, batch: pa.Table) -> pa.Table:
        valid, rejects = validate_batch(batch, self.schema)
        if rejects.num_rows and self.rejects_dir:
            import os
            import uuid

            import pyarrow.parquet as pq

            pq.write_table(
                rejects,
                os.path.join(self.rejects_dir, f"rejects-{uuid.uuid4().hex}.parquet"),
            )
        return valid
