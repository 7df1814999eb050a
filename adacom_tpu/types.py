"""Logical SQL type system and its device representations.

Parity target: the reference's LogicalType/PhysicalType
(src/common/types/*, SURVEY.md §2.2 "Type system / vectors"), restricted to
TPU-friendly physical representations:

- integers are int32/uint32 on device; 64-bit logical ints are carried as
  int64 (XLA TPU emulates s64; hot codecs split into 32-bit planes)
- DECIMAL(p,s) is a scaled integer (int64), like DuckDB's physical decimals
- DATE/TIMESTAMP are days/micros since epoch (int32/int64)
- VARCHAR is dictionary-encoded at ingest: uint32 codes on device + a host
  dictionary (the reference dictionary codec made first-class)
- BOOLEAN is uint8 {0,1} host-side, uint32 in compute
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

# x64 must be on before any jnp array is created so int64/float64 columns
# keep their width (TPU emulates 64-bit integer ops; hot paths stay 32-bit).
import os

import jax

jax.config.update("jax_enable_x64", True)

# ADACOM_PLATFORM=cpu|tpu forces the backend (the axon TPU plugin ignores
# JAX_PLATFORMS from the environment; this config update does not)
if os.environ.get("ADACOM_PLATFORM"):
    try:
        jax.config.update("jax_platforms", os.environ["ADACOM_PLATFORM"])
    except Exception:
        pass

# persistent compilation cache: engine kernel shapes repeat across processes
# (benchmarks, tests), so cache compiled executables on disk
if not os.environ.get("JAX_COMPILATION_CACHE_DIR"):
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(os.path.dirname(os.path.dirname(__file__)), ".jax_cache"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
    except Exception:
        pass


@dataclasses.dataclass(frozen=True)
class LogicalType:
    name: str
    # numpy dtype used for host staging & results
    np_dtype: np.dtype
    # True if integer-like and eligible for succinct packing
    # (reference TypeIsInteger gate, column_segment.cpp:45-82)
    integer: bool = False
    signed: bool = False
    # decimal scale (10**scale divisor); 0 for non-decimals
    scale: int = 0
    precision: int = 0
    is_string: bool = False
    is_float: bool = False

    @property
    def width_bytes(self) -> int:
        return self.np_dtype.itemsize

    def __str__(self) -> str:
        if self.name == "DECIMAL":
            return f"DECIMAL({self.precision},{self.scale})"
        return self.name


def _t(name, dtype, **kw) -> LogicalType:
    return LogicalType(name, np.dtype(dtype), **kw)


BOOLEAN = _t("BOOLEAN", np.uint8, integer=True)
TINYINT = _t("TINYINT", np.int8, integer=True, signed=True)
SMALLINT = _t("SMALLINT", np.int16, integer=True, signed=True)
INTEGER = _t("INTEGER", np.int32, integer=True, signed=True)
BIGINT = _t("BIGINT", np.int64, integer=True, signed=True)
UTINYINT = _t("UTINYINT", np.uint8, integer=True)
USMALLINT = _t("USMALLINT", np.uint16, integer=True)
UINTEGER = _t("UINTEGER", np.uint32, integer=True)
UBIGINT = _t("UBIGINT", np.uint64, integer=True)
FLOAT = _t("FLOAT", np.float32, is_float=True)
DOUBLE = _t("DOUBLE", np.float64, is_float=True)
DATE = _t("DATE", np.int32, integer=True, signed=True)
TIMESTAMP = _t("TIMESTAMP", np.int64, integer=True, signed=True)
VARCHAR = _t("VARCHAR", np.uint32, is_string=True)  # dict codes on device


def DECIMAL(precision: int, scale: int) -> LogicalType:
    return LogicalType(
        "DECIMAL", np.dtype(np.int64), integer=True, signed=True,
        scale=scale, precision=precision,
    )


_BY_NAME = {
    "BOOLEAN": BOOLEAN, "BOOL": BOOLEAN, "LOGICAL": BOOLEAN,
    "TINYINT": TINYINT, "INT1": TINYINT,
    "SMALLINT": SMALLINT, "INT2": SMALLINT, "SHORT": SMALLINT,
    "INTEGER": INTEGER, "INT": INTEGER, "INT4": INTEGER, "SIGNED": INTEGER,
    "BIGINT": BIGINT, "INT8": BIGINT, "LONG": BIGINT,
    "UTINYINT": UTINYINT, "USMALLINT": USMALLINT,
    "UINTEGER": UINTEGER, "UINT": UINTEGER,
    "UBIGINT": UBIGINT,
    "FLOAT": FLOAT, "REAL": FLOAT, "FLOAT4": FLOAT,
    "DOUBLE": DOUBLE, "FLOAT8": DOUBLE,
    "DATE": DATE, "TIMESTAMP": TIMESTAMP, "DATETIME": TIMESTAMP,
    "VARCHAR": VARCHAR, "TEXT": VARCHAR, "STRING": VARCHAR, "CHAR": VARCHAR,
    "BPCHAR": VARCHAR,
}


def type_from_name(name: str, args: Optional[list] = None) -> LogicalType:
    base = name.upper()
    if base in ("DECIMAL", "NUMERIC"):
        p, s = (args or [18, 3])
        return DECIMAL(int(p), int(s))
    if base in _BY_NAME:
        return _BY_NAME[base]
    raise ValueError(f"unknown type: {name}")


# --- integer range metadata for codec decisions -------------------------


def int_bounds(t: LogicalType) -> tuple[int, int]:
    if not t.integer:
        raise ValueError(f"{t} is not integer-typed")
    info = np.iinfo(t.np_dtype)
    return int(info.min), int(info.max)


def common_type(a: LogicalType, b: LogicalType) -> LogicalType:
    """Result type of a binary arithmetic op (simplified DuckDB promotion)."""
    if a.is_string or b.is_string:
        return VARCHAR
    if a.is_float or b.is_float:
        return DOUBLE if (a is DOUBLE or b is DOUBLE or a.name == "DECIMAL" or b.name == "DECIMAL") else FLOAT
    if a.name == "DECIMAL" or b.name == "DECIMAL":
        scale = max(a.scale, b.scale)
        return DECIMAL(38, scale)
    order = [BOOLEAN, TINYINT, UTINYINT, SMALLINT, USMALLINT, INTEGER,
             UINTEGER, BIGINT, UBIGINT, DATE, TIMESTAMP]
    ai = order.index(a) if a in order else len(order)
    bi = order.index(b) if b in order else len(order)
    t = a if ai >= bi else b
    # mixing signed/unsigned widens to signed 64-bit for safety
    if a.signed != b.signed:
        return BIGINT
    return t
