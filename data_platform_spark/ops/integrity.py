"""On-demand FK-integrity checks — the engine-side equivalent of the
reference's declarative foreign keys.

The reference enforces referential integrity with Postgres constraints
(/root/reference/dags/configure.py:341-354 — fact_char_loc FKs to
dim_character, dim_location and dim_location_role); a data lake has no
constraint engine, so integrity is a *query*: anti-join each FK column
against its dimension's keys and surface the violations.

100 TB design: each check is one join keyed on the FK. Dimension key
sets are projected to a single column and deduplicated before the join,
so genuinely small dims (role enums, nation/region) broadcast and cost
zero shuffle; large parents (orders under lineitem) fall back to a
shuffled join on the key — the same cost profile as the query load
itself, and embarrassingly parallel across FK specs.
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class FkSpec(NamedTuple):
    """One foreign-key relationship to validate."""

    fact: DataFrame
    fact_name: str
    fk_col: str
    dim: DataFrame
    ref_name: str
    pk_col: str
    broadcast_dim: bool = True  # only set False for big parent tables


def _dim_keys(spec: FkSpec):
    keys = spec.dim.select(F.col(spec.pk_col).alias("__pk")).dropDuplicates(
        ["__pk"]
    )
    return F.broadcast(keys) if spec.broadcast_dim else keys


def fk_orphans(spec: FkSpec) -> DataFrame:
    """Rows of the fact whose FK value has no match in the dimension.

    SQL FK semantics: a NULL FK is *not* a violation (MATCH SIMPLE), so
    NULLs are filtered before the anti-join.
    """
    keys = _dim_keys(spec)
    return spec.fact.filter(F.col(spec.fk_col).isNotNull()).join(
        keys, F.col(spec.fk_col) == F.col("__pk"), "left_anti"
    )


def fk_check(specs: list[FkSpec]) -> DataFrame:
    """Validate a batch of FK relationships in one DataFrame.

    Returns one row per spec: (fact_table, fk_col, ref_table, n_rows,
    n_orphans). n_rows counts every fact row; n_orphans counts non-NULL
    FK values absent from the dimension. Each spec is a single left join
    against the deduplicated key set plus a two-value aggregate, so the
    whole check is a union of tiny results.

    A fact appearing in several specs (lineitem: 3 FKs) is scanned once
    per spec — deliberate: each scan is column-pruned to one key, and
    the alternative (caching a multi-key projection of a 100 TB fact to
    share one scan) costs more than the extra pruned scans.
    """
    if not specs:
        raise ValueError("fk_check needs at least one FkSpec")
    out: DataFrame | None = None
    for spec in specs:
        keys = _dim_keys(spec)
        joined = spec.fact.select(F.col(spec.fk_col).alias("__fk")).join(
            keys, F.col("__fk") == F.col("__pk"), "left"
        )
        orphan = F.col("__fk").isNotNull() & F.col("__pk").isNull()
        agg = joined.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.coalesce(
                F.sum(F.when(orphan, 1).otherwise(0)), F.lit(0)
            )
            .cast("long")
            .alias("n_orphans"),
        ).select(
            F.lit(spec.fact_name).alias("fact_table"),
            F.lit(spec.fk_col).alias("fk_col"),
            F.lit(spec.ref_name).alias("ref_table"),
            "n_rows",
            "n_orphans",
        )
        out = agg if out is None else out.unionByName(agg)
    return out


class FkViolation(Exception):
    """Raised when a fact violates a declared FK — the engine-side analog
    of Postgres rejecting the write under the reference's constraints."""


def require_fk(specs: list[FkSpec]) -> list:
    """Enforce FK integrity: run ``fk_check`` and raise ``FkViolation``
    naming every violated edge (with orphan counts) if any FK has
    orphans. The collect is metadata-scale — one row per spec."""
    rows = fk_check(specs).collect()
    bad = [r for r in rows if r.n_orphans > 0]
    if bad:
        raise FkViolation(
            "FK violations: "
            + "; ".join(
                f"{r.fact_table}.{r.fk_col} -> {r.ref_table} "
                f"({r.n_orphans} orphans of {r.n_rows} rows)"
                for r in bad
            )
        )
    return rows


def erase_cascade(
    root: DataFrame,
    root_key: str,
    tombstones: DataFrame,
    children: list[tuple[str, DataFrame, str, str, str]],
) -> dict[str, DataFrame]:
    """Right-to-erasure cascade: delete the tombstoned root rows and
    every descendant row reachable through the declared FK chain — the
    GDPR/CCPA deletion shape run as semi/anti joins, fully distributed
    (each hop shuffles only key projections; no driver-side key list).

    ``children`` is an ordered list of hops
    ``(name, df, fk_col, parent_name, parent_key_col)``: the child's
    ``fk_col`` references ``parent_key_col`` of the parent relation
    (``parent_name`` is ``'root'`` or an earlier hop's name). Each hop's
    deleted set = rows whose FK hits the parent's deleted keys
    (left-semi); its survivors = the anti-join complement. Returns
    ``{name: surviving_df}`` including ``'root'``. Deletion is
    functional (new DataFrames), matching the engine's immutable-write
    model — callers swap results in atomically via the Warehouse.
    """
    deleted: dict[str, DataFrame] = {
        "root": root.join(
            tombstones.select(root_key).distinct(), root_key, "left_semi"
        )
    }
    out: dict[str, DataFrame] = {
        "root": root.join(
            tombstones.select(root_key).distinct(), root_key, "left_anti"
        )
    }
    for name, df, fk_col, parent_name, parent_key_col in children:
        keys = (
            deleted[parent_name]
            .select(F.col(parent_key_col).alias(fk_col))
            .distinct()
        )
        deleted[name] = df.join(keys, fk_col, "left_semi")
        out[name] = df.join(keys, fk_col, "left_anti")
    return out
