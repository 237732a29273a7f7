"""Fuzzy (edit-distance) join — Ed-Join-style q-gram prefix filtering
with Levenshtein verification (Xiao, Wang, Lin 2008). The record-
linkage / fuzzy-dedup primitive: all pairs of strings within edit
distance ``max_distance``, WITHOUT the quadratic cross join.

Blocking theory (completeness is provable, and the registered query's
oracle actually checks it against a brute-force DuckDB join):
- an edit destroys at most ``q`` of a string's overlapping character
  q-grams, so ed(a, b) <= k implies the gram multisets share at least
  max(n_a, n_b) - k*q grams (n = len - q + 1);
- prefix filtering: under ONE global gram order, if two multisets
  overlap in >= t elements, their (n - t + 1)-length prefixes
  intersect — so each string only emits its ``k*q + 1`` globally
  RAREST grams (rarest-first order doubles as a frequency skew
  killer: hot grams like a shared constant prefix never block);
- valid whenever the LONGER string has >= q*(k+1) characters. Pairs
  where both strings are shorter route to a length-banded short-string
  path (any pair within distance k differs in length by <= k, and
  both ends are short, so the band cross join is bounded by the short
  universe, not the corpus).

Engine mapping: grams build in-row (sequence + substr — one codegen
projection); the global gram-frequency table is ONE keys-only
map-side-combined aggregation; prefix selection is an in-row
sort+slice after a keys-only (id, gram, df) re-assembly; candidates
come from an equi-join on gram (<= k*q + 1 rows per string on each
side); verification is Spark's JVM levenshtein WITH the threshold
argument (early-exits above k). Strings cross the wire only for the
candidate pairs, never corpus x corpus.

Reference surface: daft/functions/str.py levenshtein_distance is the
kernel (SURVEY §2.6); the blocked join is this engine's scale
extension per the pipeline column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["fuzzy_join", "fuzzy_pairs"]


def _qgrams(col, q: int):
    """All overlapping character q-grams, in-row. Empty array for
    strings shorter than q."""
    n = F.length(col) - F.lit(q - 1)
    return F.when(
        n >= 1,
        F.transform(F.sequence(F.lit(1), n), lambda i: col.substr(i, F.lit(q))),
    ).otherwise(F.array().cast("array<string>"))


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    max_distance: int = 1,
    q: int = 3,
    left_id: str = "id_a",
    right_id: str = "id_b",
) -> DataFrame:
    """All (left, right) pairs with levenshtein(left_on, right_on)
    <= max_distance. Returns (left_id, right_id, distance int).
    ``left``/``right`` must carry the id columns already named
    ``left_id``/``right_id``."""
    k, kq1 = max_distance, max_distance * q + 1
    min_long = q * (max_distance + 1)
    if max_distance < 0:
        raise ValueError("max_distance must be >= 0")
    if q < 2:
        raise ValueError("q must be >= 2")

    l = left.select(F.col(left_id), F.col(left_on).alias("__sa"))
    r = right.select(F.col(right_id), F.col(right_on).alias("__sb"))

    def grams(df, idc, sc):
        return df.select(
            F.col(idc), F.explode(_qgrams(F.col(sc), q)).alias("gram")
        )

    lg, rg = grams(l, left_id, "__sa"), grams(r, right_id, "__sb")
    # one global rarity order over BOTH sides (keys-only agg)
    dfreq = lg.select("gram").unionAll(rg.select("gram")).groupBy("gram").agg(
        F.count(F.lit(1)).alias("__df")
    )

    def prefix(g, idc):
        # per-string kq+1 rarest gram occurrences: keys-only
        # (id, gram, df) re-assembly, in-row sort + slice
        return (
            g.join(dfreq, "gram")
            .groupBy(idc)
            .agg(
                F.slice(
                    F.array_sort(F.collect_list(F.struct("__df", "gram"))),
                    1,
                    kq1,
                ).alias("__p")
            )
            .select(F.col(idc), F.explode("__p").alias("__pg"))
            .select(F.col(idc), F.col("__pg.gram").alias("gram"))
        )

    # long-path candidates: valid when the LONGER string has
    # >= q*(k+1) chars, i.e. at least one side is long
    cand_long = (
        prefix(lg, left_id)
        .join(prefix(rg, right_id), "gram")
        .select(left_id, right_id)
        .distinct()
    )
    # short path: pairs where BOTH strings are < q*(k+1) chars —
    # length-banded cross join over the (bounded) short universe
    ls = l.filter(F.length("__sa") < min_long).select(
        left_id, "__sa", F.floor(F.length("__sa") / (k + 1)).alias("__band")
    )
    rs = r.filter(F.length("__sb") < min_long).select(
        right_id, "__sb", F.floor(F.length("__sb") / (k + 1)).alias("__band")
    )
    # a pair within distance k differs in length by <= k, so it lands
    # in the same band or an adjacent one
    rs_b = rs.select(
        right_id, "__sb", F.explode(
            F.array(F.col("__band") - 1, F.col("__band"), F.col("__band") + 1)
        ).alias("__band")
    )
    cand_short = ls.join(rs_b, "__band").select(left_id, right_id).distinct()
    cand = cand_long.unionAll(cand_short).distinct()
    # verify with the thresholded JVM kernel (returns -1 above k)
    out = (
        cand.join(l, left_id)
        .join(r, right_id)
        .filter(
            F.abs(F.length("__sa") - F.length("__sb")) <= k
        )
        .select(
            left_id,
            right_id,
            F.levenshtein("__sa", "__sb", k).alias("distance"),
        )
        .filter(F.col("distance") >= 0)
    )
    return out.select(
        left_id, right_id, F.col("distance").cast("int").alias("distance")
    )


def fuzzy_pairs(
    df: DataFrame,
    on: str,
    id_col: str = "doc_id",
    max_distance: int = 1,
    q: int = 3,
) -> DataFrame:
    """Self-join variant for fuzzy DEDUP: all within-frame pairs with
    levenshtein <= max_distance, canonically oriented (id_a < id_b).
    Feed the result to near_dup_resolve(extra_edges=...) to fold fuzzy
    string matches into the unified dedup resolution."""
    l = df.select(F.col(id_col).alias("id_a"), F.col(on).alias("__va"))
    r = df.select(F.col(id_col).alias("id_b"), F.col(on).alias("__vb"))
    out = fuzzy_join(
        l.withColumnRenamed("__va", "__s"),
        r.withColumnRenamed("__vb", "__s2"),
        "__s",
        "__s2",
        max_distance=max_distance,
        q=q,
    )
    return out.filter(F.col("id_a") < F.col("id_b"))
