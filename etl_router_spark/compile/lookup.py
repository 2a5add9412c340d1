"""Lookup stage: broadcast enrichment join.

Semantics from the reference lookup stage (``routing/src/dag.rs:41-69``,
DSL ``types.rs:765-801``, merge logic ``routing/src/engine.rs:151-217``):

- key mappings record_field -> lookup_key (engine.rs:211-217);
- merge_strategy: merge (prefixed columns merged in, engine.rs:160-169),
  nest (lookup row serialized to JSON under one field, engine.rs:171-183),
  replace (output = keys + lookup fields, engine.rs:185-193);
- on_miss: pass_through (left join), drop (inner join), error (left join
  + assert no unmatched rows) (engine.rs:196-203).

The dimension side is broadcast by default — at 100 TB the fact side
never shuffles for an enrichment join; only genuinely large dimensions
should fall back to a shuffle join (``broadcast_dim=False``).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def apply_lookup(
    df: DataFrame,
    dim: DataFrame,
    key_mappings: dict[str, str],
    merge_strategy: str = "merge",
    on_miss: str = "pass_through",
    prefix: str | None = None,
    nest_field: str = "lookup",
    lookup_fields: list[str] | None = None,
    broadcast_dim: bool = True,
) -> DataFrame:
    """Enrich ``df`` with columns from ``dim``.

    ``key_mappings``: {record_field: lookup_key_field}.
    ``lookup_fields``: dimension columns to bring in (default: all
    non-key columns).
    """
    lookup_keys = list(key_mappings.values())
    val_cols = lookup_fields or [c for c in dim.columns if c not in lookup_keys]

    # column pruning before broadcast: ship only what we merge
    dim_proj = dim.select(*lookup_keys, *val_cols)
    dim_side = F.broadcast(dim_proj) if broadcast_dim else dim_proj

    pred = reduce(
        lambda a, b: a & b,
        (df[rf] == dim_proj[lk] for rf, lk in key_mappings.items()),
    )
    how = "inner" if on_miss == "drop" else "left"
    joined = df.join(dim_side, pred, how)

    if on_miss == "error":
        misses = joined.filter(
            reduce(lambda a, b: a & b, (dim_proj[lk].isNull() for lk in lookup_keys))
        ).limit(1).count()
        if misses:
            raise ValueError("lookup miss and on_miss=error")

    out_prefix = (prefix + "_") if prefix else ""
    if merge_strategy == "merge":
        cols = [df[c] for c in df.columns]
        cols += [dim_proj[c].alias(out_prefix + c) for c in val_cols]
        return joined.select(*cols)
    if merge_strategy == "nest":
        nested = F.to_json(F.struct(*[dim_proj[c].alias(c) for c in val_cols]))
        return joined.select(*[df[c] for c in df.columns], nested.alias(prefix or nest_field))
    if merge_strategy == "replace":
        cols = [df[rf] for rf in key_mappings]
        cols += [dim_proj[c].alias(out_prefix + c) for c in val_cols]
        return joined.select(*cols)
    raise ValueError(f"unknown merge_strategy: {merge_strategy!r}")
