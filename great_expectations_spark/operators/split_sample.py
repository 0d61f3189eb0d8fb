"""Batch splitting and sampling operators.

Spark-first re-expression of the reference's splitter/sampler surface
(execution_engine/split_and_sample/sparkdf_data_splitter.py:38-322,
sparkdf_data_sampler.py:35-203): every splitter is a pure filter
transformation (so Catalyst pushes it into the scan — partition
pruning when the split column is the table's physical partitioning),
and the hashed variants use JVM-side md5/sha2 instead of the
reference's per-row Python UDF (:292-322).

All functions return a new DataFrame; none materialize anything.
"""

from __future__ import annotations

from typing import Any, Dict, Iterable, List, Optional, Union

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# date part -> pyspark function name
# (ref _convert_date_part_to_spark_equivalent)
_DATE_PART_FNS = {
    "year": "year",
    "month": "month",
    "day": "dayofmonth",
    "hour": "hour",
    "minute": "minute",
    "second": "second",
    "week": "weekofyear",
}


def split_on_whole_table(df: DataFrame) -> DataFrame:
    return df


def split_on_date_parts(
    df: DataFrame, column_name: str, date_parts: Dict[str, int]
) -> DataFrame:
    """Keep rows whose date parts equal the given values, e.g.
    {"year": 2024, "month": 3}. Parts are NOT truncated: month=3 alone
    matches March of every year (ref split_on_date_parts docstring)."""
    for part, value in date_parts.items():
        fn = _DATE_PART_FNS.get(str(part).lower())
        if fn is None:
            raise ValueError(
                f"unsupported date part {part!r}; "
                f"one of {sorted(_DATE_PART_FNS)}"
            )
        df = df.filter(getattr(F, fn)(F.col(column_name)) == int(value))
    return df


def split_on_year(df: DataFrame, column_name: str, year: int) -> DataFrame:
    return split_on_date_parts(df, column_name, {"year": year})


def split_on_year_and_month(
    df: DataFrame, column_name: str, year: int, month: int
) -> DataFrame:
    return split_on_date_parts(
        df, column_name, {"year": year, "month": month}
    )


def split_on_year_and_month_and_day(
    df: DataFrame, column_name: str, year: int, month: int, day: int
) -> DataFrame:
    return split_on_date_parts(
        df, column_name, {"year": year, "month": month, "day": day}
    )


def split_on_column_value(
    df: DataFrame, column_name: str, value: Any
) -> DataFrame:
    return df.filter(F.col(column_name) == F.lit(value))


def split_on_converted_datetime(
    df: DataFrame, column_name: str, value: str,
    date_format_string: str = "yyyy-MM-dd",
) -> DataFrame:
    """Unix-seconds column formatted to a date string, matched against
    `value` (ref :218-247)."""
    return df.filter(
        F.from_unixtime(F.col(column_name), date_format_string)
        == F.lit(value)
    )


def split_on_divided_integer(
    df: DataFrame, column_name: str, divisor: int, value: int
) -> DataFrame:
    return df.filter(
        (F.col(column_name) / F.lit(divisor)).cast("int") == int(value)
    )


def split_on_mod_integer(
    df: DataFrame, column_name: str, mod: int, value: int
) -> DataFrame:
    return df.filter(
        (F.col(column_name) % F.lit(mod)).cast("int") == int(value)
    )


def split_on_multi_column_values(
    df: DataFrame, values: Dict[str, Any]
) -> DataFrame:
    for column_name, value in values.items():
        df = df.filter(F.col(column_name) == F.lit(value))
    return df


def _hashed_suffix(
    column_name: str, hash_digits: int, hash_function_name: str
):
    """Last `hash_digits` hex chars of the hash of the stringified
    column — JVM expressions for md5/sha2 families (the reference runs
    hashlib through a per-row Python UDF; the hex output is
    identical)."""
    s = F.col(column_name).cast("string")
    if hash_function_name == "md5":
        hexed = F.md5(s)
    elif hash_function_name in ("sha256", "sha224", "sha384", "sha512"):
        hexed = F.sha2(s, int(hash_function_name[3:]))
    elif hash_function_name == "sha1":
        hexed = F.sha1(s)
    else:
        raise ValueError(
            f"unsupported hash function {hash_function_name!r}"
        )
    return F.substring(hexed, -hash_digits, hash_digits)


def split_on_hashed_column(
    df: DataFrame,
    column_name: str,
    hash_digits: int,
    value: str,
    hash_function_name: str = "sha256",
) -> DataFrame:
    return df.filter(
        _hashed_suffix(column_name, hash_digits, hash_function_name)
        == F.lit(value)
    )


# --- samplers (ref sparkdf_data_sampler.py:35-203) ---------------------------


def sample_using_limit(df: DataFrame, n: int) -> DataFrame:
    return df.limit(int(n))


def sample_using_random(
    df: DataFrame, p: float = 0.1, seed: int = 1
) -> DataFrame:
    """F.rand(seed) < p — bit-identical to the reference's sampler."""
    return (
        df.withColumn("rand", F.rand(seed=seed))
        .filter(F.col("rand") < p)
        .drop("rand")
    )


def sample_using_mod(
    df: DataFrame, column_name: str, mod: int, value: int
) -> DataFrame:
    return df.filter(
        (F.col(column_name) % F.lit(mod)).cast("int") == int(value)
    )


def sample_using_a_list(
    df: DataFrame, column_name: str, value_list: Iterable[Any]
) -> DataFrame:
    return df.filter(F.col(column_name).isin(list(value_list)))


def sample_using_hash(
    df: DataFrame,
    column_name: str,
    hash_digits: int = 1,
    hash_value: str = "f",
    hash_function_name: str = "md5",
) -> DataFrame:
    return df.filter(
        _hashed_suffix(column_name, hash_digits, hash_function_name)
        == F.lit(hash_value)
    )
