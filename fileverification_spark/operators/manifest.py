"""Per-cell Merkle manifests — the reference's per-folder ``__fv.txt``
checksum files (FileVerification/CheckSumFile.cs:14-29, :270-315) grafted
onto the cell hierarchy.

- ``leaf_manifest``    → one row per page: (res, cell, child_key, algo, hash)
  — the manifest *entries* (ref record format HashInfo.cs:271-274).
- ``leaf_digests``     → one row per cell: SHA-256 over the **sorted**
  (child_key ‖ hash) pairs. The reference writes manifest lines in
  nondeterministic parallel order (CheckSumFile.cs:280-288); sorting before
  digesting is strictly stronger and makes the digest reproducible under
  any shuffle/partitioning — the property tests pin this.
- ``merkle_ladder``    → digests chained up the resolution ladder
  (folder recursion → parent cells), enabling incremental subtree pruning:
  a parent digest equal to the checkpoint ⇒ the entire subtree is
  unchanged and is skipped (SURVEY §4 "Merkle subtree pruning").

Scale notes: the groupBy(cell) digest is a sort-agg per cell. Leaf
resolution is chosen so cells hold bounded page counts (res 12 ≈ 33M cells
for 10^12 rows → ~30k pages/cell); AQE skew-join/partition-split handles
residual hot cells, and the ladder shrinks by 8x per level so upper levels
are trivially small. Each level reuses the previous level's shuffle output
(cell → parent is a narrow projection followed by one shuffle per level,
O(levels) total shuffles on exponentially shrinking data).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fileverification_spark import grid


def leaf_manifest(pages_derived: DataFrame, res: int) -> DataFrame:
    """Manifest entries at the leaf resolution: the cell's '__fv.txt' rows."""
    return pages_derived.select(
        F.lit(res).alias("res"),
        F.col("cell"),
        F.col("url").alias("child_key"),
        F.lit("sha256").alias("algo"),
        F.col("text_sha256").alias("hash"),
    )


def _digest_over(pair: F.Column) -> F.Column:
    """upper(sha256(concat of sorted pair-strings)) — deterministic under
    any row order (c.f. nondeterministic reference order,
    FileVerification/CheckSumFile.cs:280-288)."""
    return F.upper(
        F.sha2(F.concat_ws("", F.sort_array(F.collect_list(pair))), 256)
    )


def leaf_digests(pages_derived: DataFrame, res: int) -> DataFrame:
    """(res, cell, digest, n_children) per leaf cell."""
    pair = F.concat(F.col("url"), F.col("text_sha256"))
    return (
        pages_derived.groupBy("cell")
        .agg(
            _digest_over(pair).alias("digest"),
            F.count(F.lit(1)).alias("n_children"),
        )
        .select(F.lit(res).alias("res"), "cell", "digest", "n_children")
    )


def digests_from_manifest(manifest: DataFrame, res: int) -> DataFrame:
    """Leaf digests computed from *stored* manifest entries
    (cell, child_key, hash) — the checkpoint side of an incremental
    diff when only the manifest (not the corpus) is at hand."""
    pair = F.concat(F.col("child_key"), F.col("hash"))
    return (
        manifest.groupBy("cell")
        .agg(
            _digest_over(pair).alias("digest"),
            F.count(F.lit(1)).alias("n_children"),
        )
        .select(F.lit(res).alias("res"), "cell", "digest", "n_children")
    )


def merkle_ladder(
    leaf: DataFrame, leaf_res: int, min_res: int = 0, persist: bool = True
) -> DataFrame:
    """Union of digests at every resolution in [min_res, leaf_res].

    Parent digest = sha256 over sorted (child_cell_string ‖ child_digest)
    pairs; n_children = number of child *cells*.

    ``persist`` pins the leaf level: every union branch hangs off it, and
    without materialisation Spark recomputes the expensive leaf sort-agg
    once per level (measured 4x on the bench; ReuseExchange does not fire
    across the union branches). Upper levels shrink 8x per step, so their
    recompute is noise — only the leaf needs pinning. In production the
    ladder is written to the manifests table per res, which serves the
    same purpose across runs.
    """
    if persist:
        leaf = leaf.persist()
    levels = [leaf]
    cur = leaf
    for r in range(leaf_res, min_res, -1):
        parent = (
            cur.select(
                grid.cell_parent(F.col("cell"), r, r - 1).alias("cell"),
                F.concat(F.col("cell").cast("string"), F.col("digest")).alias(
                    "pair"
                ),
            )
            .groupBy("cell")
            .agg(
                _digest_over(F.col("pair")).alias("digest"),
                F.count(F.lit(1)).alias("n_children"),
            )
            .select(F.lit(r - 1).alias("res"), "cell", "digest", "n_children")
        )
        levels.append(parent)
        cur = parent
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return out


#: Salt fan-out for hot-cell digests. 16 sub-groups caps any single
#: sort-agg at ~1/16th of the hottest cell; power-law web data rarely
#: needs more (the ladder above shrinks 8x per level anyway).
N_SALT = 16

#: Limb width for the mergeable digest: 15 hex chars = 60 bits, so a
#: 38-digit decimal sum holds >10^18 children without overflow while
#: staying exactly mirrorable in DuckDB's hugeint arithmetic.
_LIMB_HEX = 15
_LIMB_MOD = 1 << 60


def _salt_col(hash_col: F.Column) -> F.Column:
    """Deterministic salt from the child's own hash (first 4 hex chars
    mod N_SALT) — content-derived, so Spark and the DuckDB oracle agree
    without sharing a hash function (SURVEY §4: hot-cell salting)."""
    return F.conv(F.substring(hash_col, 1, 4), 16, 10).cast("bigint") % N_SALT


def salted_digests(pages_derived: DataFrame, res: int) -> DataFrame:
    """(res, cell, digest, n_children) with EXPLICIT hot-cell salting.

    Two-level Merkle within the cell: phase 1 groups by (cell, salt) —
    the hottest cell splits into N_SALT bounded sort-aggs, removing the
    single-reducer bottleneck the plain sorted digest has on power-law
    cells — phase 2 digests the sorted (salt ‖ sub-digest) pairs. The
    digest VALUE differs from leaf_digests (it is a deeper Merkle tree,
    same guarantees: any child change flips the cell digest); both ends
    of a diff just must use the same formula.
    """
    pair = F.concat(F.col("url"), F.col("text_sha256"))
    sub = (
        pages_derived.groupBy(
            "cell", _salt_col(F.col("text_sha256")).alias("salt")
        )
        .agg(
            _digest_over(pair).alias("sub_digest"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    spair = F.concat(F.col("salt").cast("string"), F.col("sub_digest"))
    return (
        sub.groupBy("cell")
        .agg(
            _digest_over(spair).alias("digest"),
            F.sum("n").alias("n_children"),
        )
        .select(F.lit(res).alias("res"), "cell", "digest", "n_children")
    )


def mergeable_digests(pages_derived: DataFrame, res: int) -> DataFrame:
    """(res, cell, digest, n_children) via an ORDER-INDEPENDENT sum
    digest (AdHash-style homomorphic hashing): each child contributes
    sha256(url ‖ text_hash) split into four 60-bit limbs; the cell digest
    is the per-limb sum mod 2^60.

    Scale properties the sorted digest cannot have:
    - **partial aggregation**: sum() combines map-side, so a hot cell
      never concentrates rows on one reducer — skew-immune by algebra,
      not by salting;
    - **O(1) state** per cell per task (4 decimals), no collect_list;
    - **incrementally updatable**: add/remove a child = add/subtract its
      limbs — the streaming-arrival path can maintain digests without
      recomputing the cell.
    Tradeoff: the additive per-limb sum is NOT collision-resistant
    against a chosen-input adversary — Wagner's generalized-birthday
    attack finds colliding subsets of attacker-controlled children far
    below 2^120 work (ADVICE r01). Mergeable digests therefore protect
    against *accidental* corruption/drift only (bit rot, missed updates,
    divergent replicas); adversarial tamper-evidence must route through
    ``leaf_digests`` / ``salted_digests`` (sorted 256-bit Merkle), which
    remain the audit path. Both forms are exposed for exactly that split.
    """
    child = F.sha2(F.concat(F.col("url"), F.col("text_sha256")), 256)
    aggs = [F.count(F.lit(1)).alias("n_children")]
    for i in range(4):
        limb = F.conv(
            F.substring(child, 1 + i * _LIMB_HEX, _LIMB_HEX), 16, 10
        ).cast("decimal(38,0)")
        aggs.append(
            (F.sum(limb) % F.lit(_LIMB_MOD).cast("decimal(38,0)"))
            .cast("bigint")
            .alias(f"l{i}")
        )
    per_cell = pages_derived.groupBy("cell").agg(*aggs)
    digest = F.concat_ws(
        "-", *[F.col(f"l{i}").cast("string") for i in range(4)]
    )
    return per_cell.select(
        F.lit(res).alias("res"), "cell", digest.alias("digest"), "n_children"
    )


def _limb_cols(pages_derived: DataFrame, sign: int) -> DataFrame:
    """(cell, n, l0..l3) per-row limb contributions with ``sign``."""
    child = F.sha2(F.concat(F.col("url"), F.col("text_sha256")), 256)
    cols = [F.col("cell"), F.lit(sign).cast("bigint").alias("n")]
    for i in range(4):
        limb = F.conv(
            F.substring(child, 1 + i * _LIMB_HEX, _LIMB_HEX), 16, 10
        ).cast("decimal(38,0)")
        cols.append((limb * sign).alias(f"l{i}"))
    return pages_derived.select(*cols)


def update_mergeable_digests(
    digests: DataFrame,
    added: DataFrame,
    removed: DataFrame,
    res: int,
) -> DataFrame:
    """Incrementally maintain mergeable_digests: add the limb sums of
    ``added`` rows and subtract those of ``removed`` rows — NO rescan of
    unchanged children (the streaming-arrival maintenance path the sum
    digest exists for; the sorted Merkle digest cannot do this).

    ``digests`` is prior mergeable_digests output; added/removed are
    pages-shaped (cell, url, text_sha256). Cells whose child count drops
    to zero disappear; brand-new cells appear. The result is IDENTICAL
    to recomputing mergeable_digests over the updated corpus (pinned by
    tests) — O(|delta|) work instead of O(|corpus|).
    """
    delta = (
        _limb_cols(added, 1)
        .unionByName(_limb_cols(removed, -1))
        .groupBy("cell")
        .agg(
            F.sum("n").alias("d_n"),
            *[F.sum(f"l{i}").alias(f"d_l{i}") for i in range(4)],
        )
    )
    old_limbs = digests.select(
        "cell",
        F.col("n_children").alias("o_n"),
        *[
            F.split(F.col("digest"), "-")[i]
            .cast("decimal(38,0)")
            .alias(f"o_l{i}")
            for i in range(4)
        ],
    )
    merged = old_limbs.join(delta, "cell", "full_outer")
    mod = F.lit(_LIMB_MOD).cast("decimal(38,0)")
    n_new = F.coalesce(F.col("o_n"), F.lit(0)) + F.coalesce(F.col("d_n"), F.lit(0))
    limb_exprs = []
    for i in range(4):
        raw = F.coalesce(F.col(f"o_l{i}"), F.lit(0).cast("decimal(38,0)")) + F.coalesce(
            F.col(f"d_l{i}"), F.lit(0).cast("decimal(38,0)")
        )
        # pmod for decimals: ((raw % m) + m) % m keeps the subtraction
        # branch non-negative, matching the recompute's plain sum % m
        limb_exprs.append(
            (((raw % mod) + mod) % mod).cast("bigint").cast("string")
        )
    return merged.where(n_new > 0).select(
        F.lit(res).alias("res"),
        "cell",
        F.concat_ws("-", *limb_exprs).alias("digest"),
        n_new.alias("n_children"),
    )


def changed_cells(current: DataFrame, checkpoint: DataFrame) -> DataFrame:
    """Cells whose digest differs between current and checkpoint — the
    incremental-verify frontier. FULL outer on (res, cell): a cell present
    on only one side is changed too (new cell, or a cell whose every child
    vanished — the reference reports those children as missing,
    FileVerification/PathInfo.cs:303-354, so the frontier must keep them).
    Digest equality prunes unchanged subtrees before any leaf hashing."""
    cp = checkpoint.select(
        F.col("res").alias("cp_res"),
        F.col("cell").alias("cp_cell"),
        F.col("digest").alias("cp_digest"),
    )
    joined = current.join(
        cp,
        (current["res"] == cp["cp_res"]) & (current["cell"] == cp["cp_cell"]),
        "full_outer",
    )
    return joined.where(
        F.col("cp_digest").isNull()
        | F.col("digest").isNull()
        | (F.col("digest") != F.col("cp_digest"))
    ).select(
        F.coalesce(current["res"], F.col("cp_res")).alias("res"),
        F.coalesce(current["cell"], F.col("cp_cell")).alias("cell"),
        F.col("digest"),
        F.col("n_children"),
    )


# ---------------------------------------------------------------------------
# DuckDB SQL mirrors (oracle). string_agg(ORDER BY) == sort_array+concat_ws.
# ---------------------------------------------------------------------------

def sql_leaf_digests(res: int, pages_rel: str = "pages") -> str:
    """SELECT body producing (res, cell, digest, n_children) in DuckDB."""
    return f"""
SELECT {res} AS res, cell,
       upper(sha256(string_agg(url || text_sha256, '' ORDER BY url || text_sha256))) AS digest,
       count(*) AS n_children
FROM {pages_rel}
GROUP BY cell"""


def sql_salted_digests(res: int, pages_rel: str = "pages") -> str:
    """SELECT body mirroring salted_digests (two-level Merkle)."""
    return f"""
SELECT {res} AS res, cell,
       upper(sha256(string_agg(CAST(salt AS VARCHAR) || sub_digest, ''
             ORDER BY CAST(salt AS VARCHAR) || sub_digest))) AS digest,
       CAST(sum(n) AS BIGINT) AS n_children
FROM (
  SELECT cell,
         CAST(('0x' || substr(text_sha256, 1, 4)) AS BIGINT) % {N_SALT} AS salt,
         upper(sha256(string_agg(url || text_sha256, ''
               ORDER BY url || text_sha256))) AS sub_digest,
         count(*) AS n
  FROM {pages_rel}
  GROUP BY 1, 2
) GROUP BY cell"""


def sql_mergeable_digests(res: int, pages_rel: str = "pages") -> str:
    """SELECT body mirroring mergeable_digests (per-limb sums mod 2^60)."""
    limbs = []
    for i in range(4):
        e = (
            f"CAST(sum(CAST(('0x' || substr(child, {1 + i * _LIMB_HEX}, "
            f"{_LIMB_HEX})) AS BIGINT)) % {_LIMB_MOD} AS BIGINT)"
        )
        limbs.append(f"CAST({e} AS VARCHAR)")
    digest = " || '-' || ".join(limbs)
    return f"""
SELECT {res} AS res, cell, {digest} AS digest, count(*) AS n_children
FROM (SELECT cell, sha256(url || text_sha256) AS child FROM {pages_rel})
GROUP BY cell"""


def sql_parent_digests(child_rel: str, res: int) -> str:
    """SELECT body rolling ``child_rel`` (res, cell, digest) one level up."""
    parent = grid.sql_cell_parent("cell", res, res - 1)
    return f"""
SELECT {res - 1} AS res, {parent} AS cell,
       upper(sha256(string_agg(CAST(cell AS VARCHAR) || digest, ''
             ORDER BY CAST(cell AS VARCHAR) || digest))) AS digest,
       count(*) AS n_children
FROM {child_rel}
GROUP BY {parent}"""
