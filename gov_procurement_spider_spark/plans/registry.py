"""Query registry: every SURVEY.md §2 operator gets a Spark callable and
(when SQL-expressible) a DuckDB oracle SQL string. The external driver runs
both sides at sf=0.01 and compares row count + schema + order-insensitive
value hash; tests/test_oracle_parity.py replays the same comparison."""

from __future__ import annotations

import warnings
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]
# an oracle may be a plain SQL string or a zero-arg callable resolved at
# oracle_sql() time — for queries whose oracle embeds values derived from
# the data (ml4's trained IVF centroids become SQL literals lazily, so
# import stays cheap and the literals always match the current testdata)
Oracle = "str | Callable[[], str] | None"

_REGISTRY: dict[str, tuple[QueryFn, object]] = {}


def register(name: str, oracle):
    def deco(fn: QueryFn) -> QueryFn:
        _REGISTRY[name] = (fn, oracle)
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    return {k: v[0] for k, v in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for k, (_, oracle) in _REGISTRY.items():
        if oracle is None:
            continue
        if callable(oracle):
            try:
                oracle = oracle()
            except Exception as e:  # noqa: BLE001 — degrade-only-its-own-row
                # a lazy oracle that fails for ANY reason (testdata absent,
                # pyarrow schema drift, ImportError, …) degrades ITS OWN row
                # to rows-only — it must never take the other ~46 oracles
                # down with it (round-4 ADVICE broadened this from OSError)
                warnings.warn(f"oracle for {k!r} unavailable ({e}); skipped")
                continue
        out[k] = oracle
    return out
