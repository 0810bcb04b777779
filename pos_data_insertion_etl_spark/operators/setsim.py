"""Exact set-similarity JOIN via prefix filtering (PPJoin-style).

The third leg of the near-dup stack, with a different guarantee from
each sibling:

* q54 ngram_jaccard — exact Jaccard but only over id-gap-bounded
  candidate pairs (not corpus-complete);
* q55/q90 MinHash+LSH — corpus-complete candidates but probabilistic
  (banding can miss true pairs);
* THIS — corpus-complete AND exact: every pair with Jaccard >= t is
  guaranteed found, no hashing luck involved.

The pigeonhole guarantee: order every set's elements canonically by
(ascending global frequency, element). If J(x,y) >= t then
|x ∩ y| >= ceil(t*|x|) (since overlap >= t*max(|x|,|y|) and is an
integer), so among the first |x| - ceil(t*|x|) + 1 elements of x (its
"prefix") at least one is shared with y — otherwise all common
elements would fit in x's suffix of size ceil(t*|x|) - 1 < |x ∩ y|.
Candidates are therefore (prefix(a) JOIN full index of b) pairs — an
equi-join on the element digest, with the prefix drawn from the
RAREST elements, which is what keeps candidate fan-out near-linear:
a frequency-ordered prefix token touches few postings by
construction. No threshold shortcut is approximate: the verify step
recomputes exact intersections and applies the threshold as an
integer cross-multiplication.

Scale shape: one digest-frequency groupBy, one per-doc rank window,
one digest equi-join for candidates; verify groups the element table
ONCE into per-document digest arrays and computes each candidate
pair's intersection map-side (array_intersect) -- the element table
crosses one exchange, not two, and no pair-expanded rows shuffle.
Worst case remains quadratic for a corpus of identical documents
(that is the true answer's size); for real corpora the rare-prefix
bound applies. Digests (md5) shuffle, raw shingles never do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..functions.text import shingles, tokens
from ..lineage import cut_lineage


def prefix_filter_jaccard_join(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    t_num: int = 1,
    t_den: int = 2,
) -> DataFrame:
    """All document pairs (id_a < id_b) with word-n-gram-set Jaccard
    >= t_num/t_den, exactly.

    Output: [id_a, id_b, n_common, n_a, n_b, jaccard] where jaccard is
    the one-shot ROUND(double, 6) display value; the threshold filter
    itself is the exact integer test
    n_common * t_den >= t_num * (n_a + n_b - n_common).
    """
    if not (0 < t_num <= t_den):
        raise ValueError("threshold must satisfy 0 < t_num/t_den <= 1")
    sd = (
        docs.select(
            F.col(id_col).alias("_id"),
            F.explode(
                F.array_distinct(
                    shingles(tokens(F.lower(F.col(text_col))), n)
                )
            ).alias("_g"),
        )
        .select("_id", F.md5(F.col("_g")).alias("_d"))
        .transform(cut_lineage, eager=False)
    )  # three consumers (freq, candidate b-side, verify) on one explode
    freq = sd.groupBy("_d").agg(F.count(F.lit(1)).alias("_f"))
    ranked = (
        sd.join(freq, "_d")
        .withColumn(
            "_pos",
            F.row_number().over(
                W.partitionBy("_id").orderBy("_f", "_d")
            ),
        )
        .withColumn(
            "_sz", F.count(F.lit(1)).over(W.partitionBy("_id"))
        )
    )
    # prefix length = sz - ceil(t*sz) + 1; ceil(sz*p/q) on positive
    # ints = (sz*p + q - 1) div q -- exact in any engine
    prefix = (
        ranked.filter(
            F.col("_pos")
            <= F.col("_sz")
            - F.expr(f"(_sz * {t_num} + {t_den} - 1) div {t_den}")
            + F.lit(1)
        )
        .select("_id", "_d", "_sz", "_pos")
        .transform(cut_lineage, eager=False)
    )  # both candidate sides read the SAME ranked prefix: one freq
    #    join + one rank window instead of two
    # PREFIX x PREFIX candidates (Chaudhuri/Xiao): if J(x,y) >= t the
    # required overlap is >= ceil(t*max(|x|,|y|)) >= ceil(t*|x|) and
    # >= ceil(t*|y|), so BOTH canonical prefixes must share an element
    # -- indexing only prefixes cuts the posting lists roughly in half
    # at t=1/2 (measured 4.8 s -> see PLANS.md). The size filter is the
    # other standard prune: J >= t forces t*|x| <= |y| (and vice
    # versa), checked with exact integer cross-multiplication.
    #
    # PPJoin+ POSITIONAL filter (r10): a shared prefix element at
    # canonical positions (i, j) bounds the whole intersection --
    # common elements before it number <= min(i, j) - 1, itself is 1,
    # after it <= min(|x| - i, |y| - j), so
    #     |x ∩ y| <= min(i, j) + min(|x| - i, |y| - j)
    # (sound for ANY shared element because both sets order elements
    # by the same global (freq, digest) key). J >= t also forces
    #     |x ∩ y| >= ceil(t_num * (|x| + |y|) / (t_num + t_den)) = α
    # so a pair whose TIGHTEST shared-prefix bound is below α cannot
    # pass verification and is pruned before the expensive
    # intersection join. The dedup groupBy replaces the old
    # .distinct() -- same shuffle, extra MIN aggregate, fewer
    # survivors (measured in PLANS.md).
    cands = (
        prefix.select(
            F.col("_id").alias("id_a"),
            "_d",
            F.col("_sz").alias("_sza"),
            F.col("_pos").alias("_pa"),
        )
        .join(
            prefix.select(
                F.col("_id").alias("id_b"),
                "_d",
                F.col("_sz").alias("_szb"),
                F.col("_pos").alias("_pb"),
            ),
            "_d",
        )
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.col("_szb") * t_den >= F.col("_sza") * t_num)
            & (F.col("_sza") * t_den >= F.col("_szb") * t_num)
        )
        .groupBy("id_a", "id_b")
        .agg(
            F.min(
                F.least("_pa", "_pb")
                + F.least(
                    F.col("_sza") - F.col("_pa"),
                    F.col("_szb") - F.col("_pb"),
                )
            ).alias("_ub"),
            F.first("_sza").alias("_sza"),
            F.first("_szb").alias("_szb"),
        )
        .filter(
            F.col("_ub") * (t_num + t_den)
            >= F.lit(t_num) * (F.col("_sza") + F.col("_szb"))
        )
        .select("id_a", "id_b", "_sza", "_szb")
    )
    # Set sizes ride along from the candidate stage (r15 optimization
    # round): `_sz` is the per-document element count computed by the
    # rank window, i.e. exactly |x| -- re-deriving it as a separate
    # sd.groupBy aggregation and re-attaching it with TWO pair-table
    # joins was a full extra pass over the element table plus two
    # shuffles. first() is well-defined: every row of a (id_a, id_b)
    # group carries the same _sza/_szb.
    #
    # MAP-SIDE intersection verify (r16 optimization round, guide
    # §2.3/§3.2/§8): the old verify joined `sd` TWICE -- an id_a-keyed
    # probe expanding each candidate pair to its a-side element ROWS
    # (sum(|A|) rows through an exchange: 42M at sf0.1's dup-heavy
    # fixture), then an (id_b, _d)-keyed join shipping the expanded
    # rows AND the whole element table through a second exchange, and
    # finally a pair-keyed count over the matches. Now:
    #
    # 1. The pair table is CUT (it is the guide-§8 "small rows"
    #    decision table -- 4 integer columns per pair) because two
    #    consumers read it: the candidate-doc id list and the verify
    #    chain.
    # 2. `sd` is SEMI-FILTERED to candidate documents before anything
    #    heavy (guide §3.2): in a real corpus candidates are the
    #    near-dups, a sliver of the corpus, so the element bytes that
    #    reach the verify shrink from |corpus| to |candidate docs|.
    # 3. The surviving elements group ONCE into per-document digest
    #    arrays, the two attach joins ship each side's array to the
    #    pair row, and n_common = size(array_intersect(...)) evaluates
    #    per row -- no expanded-row shuffle, no pair-keyed aggregation.
    #    Per-doc digests are distinct (array_distinct upstream), so the
    #    distinct intersection size IS the overlap count; per-doc
    #    arrays are bounded by one document's shingle set, the same
    #    per-doc envelope the rank window above already requires.
    #
    # Measured at sf0.1 (309k candidate pairs over 5000 docs -- the
    # WORST case for the semi-filter, which removes almost nothing
    # there): verify stage 4.7/3.4 s -> 3.4-4.2 s, identical 256 rows;
    # the win is the corpus-sparse case where the old shape shuffled
    # the full element table twice regardless of candidate count.
    cands = cands.transform(cut_lineage, eager=False)
    cand_ids = (
        cands.select(F.col("id_a").alias("_cid"))
        .unionByName(cands.select(F.col("id_b").alias("_cid")))
        .distinct()
    )
    sd_cand = sd.join(cand_ids, sd["_id"] == cand_ids["_cid"], "left_semi")
    arrs = sd_cand.groupBy("_id").agg(F.collect_list("_d").alias("_arr"))
    inter = (
        cands.join(
            arrs.select(F.col("_id").alias("id_a"), F.col("_arr").alias("_aa")),
            "id_a",
        )
        .join(
            arrs.select(F.col("_id").alias("id_b"), F.col("_arr").alias("_ab")),
            "id_b",
        )
        .select(
            "id_a",
            "id_b",
            F.size(F.array_intersect("_aa", "_ab")).alias("n_common"),
            F.col("_sza").alias("n_a"),
            F.col("_szb").alias("n_b"),
        )
    )
    return (
        inter.filter(
            F.col("n_common") * t_den
            >= F.lit(t_num) * (F.col("n_a") + F.col("n_b") - F.col("n_common"))
        )
        .select(
            "id_a",
            "id_b",
            F.col("n_common").cast("long").alias("n_common"),
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            F.round(
                F.col("n_common").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
                6,
            ).alias("jaccard"),
        )
    )
