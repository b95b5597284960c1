"""Stage 7a — coarse entity-type mapping (T1/T2).

Native reimplementation of ``entity_types_map``
(``/root/reference/R/entity_types.R:110-227``) as pure column expressions —
the mapping is tiny, so it compiles straight into whole-stage codegen
(array_contains chains), no join, no UDF.

Semantics preserved:
- input is the pipe-wrapped per-KB type pivot (e.g. ``"|Place|Location|"``);
- every mapping value found among the row's types contributes its category;
- matched categories are deduped, sorted alphabetically, pipe-joined
  (R/entity_types.R:138-141);
- no match (or NULL input) => ``other`` (default "MISC");
- multi-KB mapping entries are written ``"KB:Type"`` and routed to the
  ``{KB}_type`` column (R/entity_types.R:4-29); per-KB results are re-split,
  deduped, sorted and re-joined (R/entity_types.R:195-208);
- a type mapped to two categories within one KB aborts
  (R/entity_types.R:169-179).
"""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import Column, DataFrame, functions as F


def _category_expr(
    col: Column, pairs: list[tuple[str, str]], other: str
) -> Column:
    """T1 over one pipe-wrapped types column. pairs = [(category, type)]."""
    types_arr = F.split(F.regexp_replace(col, r"^\|+|\|+$", ""), r"\|")
    cats = F.array(
        *[
            F.when(F.array_contains(types_arr, F.lit(typ)), F.lit(cat))
            for cat, typ in pairs
        ]
    )
    matched = F.array_sort(
        F.array_distinct(F.filter(cats, lambda c: c.isNotNull()))
    )
    joined = F.array_join(matched, "|")
    return F.when(
        col.isNull() | (F.size(matched) == 0), F.lit(other)
    ).otherwise(joined)


def entity_types_map_column(
    col: Column, mapping: list[tuple[str, str]], other: str = "MISC"
) -> Column:
    """Character-vector method (R/entity_types.R:110-151).

    ``mapping`` is ``[(category, type)]`` — the named-vector pairs.
    """
    return _category_expr(col, mapping, other)


def entity_types_map(
    df: DataFrame,
    mapping: list[tuple[str, str]],
    other: str = "MISC",
    out_col: str = "category",
) -> DataFrame:
    """data.table method (R/entity_types.R:154-227).

    ``mapping`` entries are ``(category, "KB:Type")``; each KB routes to the
    ``{KB}_type`` column, per-KB categories are merged across KBs.
    """
    per_kb: dict[str, list[tuple[str, str]]] = defaultdict(list)
    for cat, spec in mapping:
        if ":" not in spec:
            raise ValueError(
                "mapping_vector must include the type source for data.table "
                f"inputs (got {spec!r}; mirrors R/entity_types.R:10-15)"
            )
        kb, typ = spec.split(":", 1)
        per_kb[kb].append((cat, typ))

    for kb, pairs in per_kb.items():
        if f"{kb}_type" not in df.columns:
            raise ValueError(
                f"no column {kb}_type for mapping source {kb!r} "
                "(mirrors R/entity_types.R:10-15)"
            )
        seen: dict[str, str] = {}
        for cat, typ in pairs:
            if typ in seen and seen[typ] != cat:
                raise ValueError(
                    f"type {typ!r} mapped onto multiple categories "
                    "(mirrors R/entity_types.R:169-179)"
                )
            seen[typ] = cat

    kb_cols = [
        _category_expr(F.col(f"{kb}_type"), pairs, other)
        for kb, pairs in per_kb.items()
    ]
    if len(kb_cols) == 1:
        category = kb_cols[0]
    else:
        # cross-KB merge: re-split, unique, sort, re-join (R/entity_types.R:195-208)
        merged = F.array_sort(
            F.array_distinct(
                F.flatten(F.array(*[F.split(c, r"\|") for c in kb_cols]))
            )
        )
        category = F.array_join(merged, "|")
    return df.withColumn(out_col, category)
