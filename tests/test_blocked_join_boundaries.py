"""Planted boundary fixtures for every blocked-join dedup tier — the
standing rule adopted after round 8 (SURVEY §5): oracle parity at one
scale factor is NOT a losslessness proof, because the sampled corpus may
never visit the algorithm's structural boundary (the round-8 probe-grid
recall hole was green at sf0.01 and still missed every lev≤1 pair of
titles ≥ 32 chars). Each blocked/bucketed join therefore ships
adversarial cases AT its boundary: length splits, chunk seams,
hot-key caps at the exact edge, thresholds at τ and τ±ε, and a seeded
brute-force cross-check.

The short-title cases in this file fail on the pre-round-9
edit_neardup_pairs (which silently returned zero pairs whenever
min(len) < 16 — the round-9 ADVICE finding); the ≥-32-char cases fail
on the pre-round-8 fixed {15,16} probe grid.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from is3107datapipelineproject_spark.operators.dedup import (
    _EDIT_SHORT_MAX,
    edit_neardup_pairs,
    prefix_jaccard_pairs,
)


def _pairs(df, spark, **kw):
    out = edit_neardup_pairs(spark.createDataFrame(df, ["tid", "tt"]), "tid", "tt", **kw)
    return {(r.a, r.b): (r.lev, r.na, r.nb) for r in out.collect()}


def _lev1(s: str, t: str) -> bool:
    """Reference predicate: lev(s, t) <= 1 for distinct s, t."""
    if s == t:
        return True
    ls, lt = len(s), len(t)
    if abs(ls - lt) > 1:
        return False
    if ls == lt:
        return sum(a != b for a, b in zip(s, t)) == 1
    if ls > lt:
        s, t, ls, lt = t, s, lt, ls
    # s shorter by 1: s must equal t with one char dropped
    i = 0
    while i < ls and s[i] == t[i]:
        i += 1
    return s[i:] == t[i + 1 :]


class TestEditShortTitles:
    """The ADVICE-medium finding: titles below the PassJoin chunk width
    must route through the symmetric-deletion tier, not vanish."""

    def test_substitution_short(self, spark):
        # the literal repro from the round-9 ADVICE
        out = _pairs([(1, "hello worl"), (2, "hallo worl")], spark)
        assert out == {(1, 2): (1, 1, 1)}

    def test_all_edit_kinds_short(self, spark):
        rows = [
            (1, "data pipe"),
            (2, "date pipe"),   # substitution
            (3, "data pipes"),  # insertion at end
            (4, "dat pipe"),    # deletion
            (5, "data pipe"),   # exact duplicate of 1 -> collapses, grp=2
            (6, "unrelated"),
        ]
        out = _pairs(rows, spark)
        # (2,4) is genuine too: "date pipe" minus its 'e' IS "dat pipe"
        assert set(out) == {(1, 2), (1, 3), (1, 4), (2, 4)}, out
        assert out[(1, 2)] == (1, 2, 1)  # na carries the collapsed group size

    def test_single_char_titles(self, spark):
        # every pair of distinct 1-char titles is lev=1 (substitution);
        # the shared "" deletion key must find all three pairs
        out = _pairs([(1, "a"), (2, "b"), (3, "c")], spark)
        assert set(out) == {(1, 2), (1, 3), (2, 3)}

    def test_true_distance_two_rejected(self, spark):
        # "abcd"/"acbd" (a transposition, lev=2) SHARE deletion keys
        # ("abd", "acd") -> they become a candidate but must fail the
        # exact verify; "ab" differs by 2 in length from both
        out = _pairs([(1, "abcd"), (2, "acbd"), (3, "ab")], spark)
        assert out == {}


class TestEditLengthSeams:
    """Pairs straddling the short/long tier boundary (len 30/31/32/33)
    and edits at the chunk1|chunk2 seam (positions 16/17)."""

    @pytest.mark.parametrize("n", [30, 31, 32, 33])
    def test_cross_length_deletion(self, spark, n):
        base = ("x" * 5 + "abcdefghijklmnopqrstuvwxyz0123456789")[:n]
        assert len(base) == n
        shorter = base[: n // 2] + base[n // 2 + 1 :]  # delete one mid char
        out = _pairs([(1, base), (2, shorter), (3, "z" * n)], spark)
        assert set(out) == {(1, 2)}, (n, out)

    @pytest.mark.parametrize("n", [31, 32])
    @pytest.mark.parametrize("pos", [15, 16, 17])  # 0-based edit position at the seam
    def test_seam_substitution(self, spark, n, pos):
        base = "abcdefghijklmnopqrstuvwxyz0123456789"[:n]
        mutated = base[:pos] + "#" + base[pos + 1 :]
        out = _pairs([(1, base), (2, mutated)], spark)
        assert set(out) == {(1, 2)}, (n, pos, out)

    def test_boundary_constant_is_what_tests_assume(self):
        # the seam cases above are built around the tier split; if the
        # constant moves, the parametrized lengths must move with it
        assert _EDIT_SHORT_MAX == 31


class TestEditBruteForce:
    def test_seeded_random_corpus_matches_brute_force(self, spark):
        """Seeded mixed-length corpus (lengths 1..45, planted mutations
        plus decoys) — the algorithm's pair set must equal quadratic
        ground truth over distinct titles."""
        rng = random.Random(1107)
        alphabet = "abcdefgh "
        titles = []
        for i in range(120):
            n = rng.randint(1, 45)
            titles.append("".join(rng.choice(alphabet) for _ in range(n)))
        rows = [(i, t) for i, t in enumerate(titles)]
        nxt = len(rows)
        for i, t in list(enumerate(titles))[::7]:  # plant mutations
            kind = rng.randint(0, 2)
            p = rng.randrange(len(t))
            if kind == 0:
                m = t[:p] + rng.choice(alphabet) + t[p + 1 :]  # may equal t
            elif kind == 1:
                m = t[:p] + rng.choice(alphabet) + t[p:]
            else:
                m = t[:p] + t[p + 1 :]
            if m:
                rows.append((nxt, m))
                nxt += 1
        # brute-force truth over distinct titles, min-id representatives
        by_title = {}
        for i, t in rows:
            if t not in by_title:
                by_title[t] = i
            by_title[t] = min(by_title[t], i)
        reps = sorted(by_title.items(), key=lambda kv: kv[1])
        truth = set()
        for i in range(len(reps)):
            for j in range(i + 1, len(reps)):
                (t1, id1), (t2, id2) = reps[i], reps[j]
                if _lev1(t1, t2):
                    truth.add((min(id1, id2), max(id1, id2)))
        out = _pairs(rows, spark, hot_key_cap=100_000)
        assert set(out) == truth, (
            f"missed={truth - set(out)} spurious={set(out) - truth}"
        )


class TestEditHotCapEdge:
    def test_exactly_at_cap_passes(self, spark):
        # 6 distinct short titles sharing the deletion key "common"
        rows = [(i, "common" + c) for i, c in enumerate("abcdef")]
        out = _pairs(rows, spark, hot_key_cap=6)
        # all 15 pairs are genuine lev=1 (same 6-char stem, one suffix char)
        assert len(out) == 15

    def test_one_past_cap_raises(self, spark):
        rows = [(i, "common" + c) for i, c in enumerate("abcdef")]
        with pytest.raises(ValueError, match="quadratic"):
            _pairs(rows, spark, hot_key_cap=5)

    def test_long_tier_cap_edge(self, spark):
        stem = "shared boilerplate opening!!"[:16]
        assert len(stem) == 16
        rows = [(i, stem + f"wholly distinct tail number {i:04d}") for i in range(5)]
        # chunk1 key shared by 5 distinct long titles: cap 5 passes, 4
        # raises; the tails differ in their last digit only, so all 10
        # pairs are genuine lev=1 — recall through a shared-chunk1 block
        out = _pairs(rows, spark, hot_key_cap=5)
        assert len(out) == 10 and all(v[0] == 1 for v in out.values())
        with pytest.raises(ValueError, match="quadratic"):
            _pairs(rows, spark, hot_key_cap=4)


class TestPrefixJaccardTauBoundary:
    """PPJoin prunes are built against τ−1e-4 so a pair AT the threshold
    (or rounding up to it) can never be pruned; pairs below τ must drop
    at the exact verify, not by accident of the prefix."""

    @staticmethod
    def _docs(spark, docs):
        return spark.createDataFrame(docs, ["doc_id", "text"])

    def test_pair_exactly_at_tau_kept(self, spark):
        # 10 tokens each, 9 shared -> J = 9/11 = 0.8182; and a tighter
        # pair: 9 shared of (9, 9+... ) build exact 0.8: |x|=9,|y|=9,
        # i=8 -> J = 8/10 = 0.8 exactly
        x = " ".join(f"tok{i}" for i in range(9))
        y = " ".join([f"tok{i}" for i in range(8)] + ["only_y"])
        df = self._docs(spark, [(1, x), (2, y)])
        out = prefix_jaccard_pairs(df, "text", "doc_id", threshold=0.8, shingles=False)
        rows = out.collect()
        assert [(r.doc1, r.doc2, float(r.jaccard)) for r in rows] == [(1, 2, 0.8)]

    def test_pair_just_below_tau_dropped(self, spark):
        # i=8, |x|=9, |y|=10 -> J = 8/11 = 0.7273 < 0.8
        x = " ".join(f"tok{i}" for i in range(9))
        y = " ".join([f"tok{i}" for i in range(8)] + ["only_y", "only_y2"])
        df = self._docs(spark, [(1, x), (2, y)])
        out = prefix_jaccard_pairs(df, "text", "doc_id", threshold=0.8, shingles=False)
        assert out.count() == 0

    def test_shared_token_only_in_last_prefix_slot(self, spark):
        """The prefix-length ⌈·⌉ seam: both docs' rarest token is their
        own unshared one (df=1 sorts first), so the candidate join can
        only fire on a SHARED token sitting at the last prefix slot —
        prefix len = m − ⌈τ·m⌉ + 1 = 10 − 8 + 1 = 3, shared tokens
        start at pos 2."""
        shared = [f"s{i:02d}" for i in range(9)]
        x = " ".join(["only_x"] + shared)
        y = " ".join(["only_y"] + shared)
        df = self._docs(spark, [(1, x), (2, y)])
        out = prefix_jaccard_pairs(df, "text", "doc_id", threshold=0.8, shingles=False)
        rows = out.collect()
        assert len(rows) == 1 and abs(float(rows[0].jaccard) - round(9 / 11, 4)) < 1e-9

    def test_posting_cap_edge(self, spark):
        # m=5 -> prefix len 2: pos1 = the doc's own df-1 token, pos2 =
        # the lexically-first shared token -> "hot1" lands in EVERY
        # doc's prefix (posting size = 8). Cap at 8 passes, 7 raises
        # toward exact-dedup-first.
        docs = [(i, f"hot1 hot2 hot3 hot4 uniq{i}") for i in range(8)]
        df = self._docs(spark, docs)
        prefix_jaccard_pairs(
            df, "text", "doc_id", threshold=0.8, shingles=False, max_prefix_posting=8
        ).count()
        with pytest.raises(ValueError, match="exact_dedup first"):
            prefix_jaccard_pairs(
                df, "text", "doc_id", threshold=0.8, shingles=False, max_prefix_posting=7
            ).count()


class TestIncrementalEditBoundaries:
    """The new×old twin shares the key machinery but exercises the
    ASYMMETRIC join (corpus indexes 2 chunk keys, batch probes 4) —
    its seams get their own planted cases + a seeded brute force."""

    @staticmethod
    def _inc(spark, old, new, **kw):
        from is3107datapipelineproject_spark.operators.dedup import (
            incremental_edit_neardup,
        )

        out = incremental_edit_neardup(
            spark.createDataFrame(old, ["id", "t"]),
            spark.createDataFrame(new, ["id", "t"]),
            "id",
            "t",
            **kw,
        )
        return {(r.new_id, r.old_id): (r.lev, r.n_old) for r in out.collect()}

    @pytest.mark.parametrize("n", [30, 31, 32, 33])
    @pytest.mark.parametrize("direction", ["old_longer", "new_longer"])
    def test_cross_length_seam(self, spark, n, direction):
        base = ("y" * 4 + "abcdefghijklmnopqrstuvwxyz0123456789")[:n]
        shorter = base[: n // 2] + base[n // 2 + 1 :]
        if direction == "old_longer":
            old, new = [(1, base)], [(11, shorter)]
        else:
            old, new = [(1, shorter)], [(11, base)]
        out = self._inc(spark, old, new)
        assert set(out) == {(11, 1)}, (n, direction, out)

    def test_lev0_membership_and_collapse(self, spark):
        old = [(5, "dup title"), (2, "dup title"), (9, "dup title")]
        new = [(11, "dup title"), (12, "dup titles")]
        out = self._inc(spark, old, new)
        assert out == {(11, 2): (0, 3), (12, 2): (1, 3)}

    def test_seeded_random_matches_brute_force(self, spark):
        rng = random.Random(2209)
        alphabet = "abcde "
        pool = []
        for _ in range(90):
            n = rng.randint(1, 40)
            pool.append("".join(rng.choice(alphabet) for _ in range(n)))
        for i in range(0, len(pool), 6):  # plant near variants
            t = pool[i]
            p = rng.randrange(len(t))
            pool.append(t[:p] + rng.choice(alphabet) + t[p + 1 :])
        rows = [(i, t) for i, t in enumerate(pool)]
        old = [r for r in rows if r[0] % 3 != 0]
        new = [r for r in rows if r[0] % 3 == 0]
        groups = {}
        for i, t in old:
            rep, cnt = groups.get(t, (i, 0))
            groups[t] = (min(rep, i), cnt + 1)
        truth = {}
        for i, t in new:
            for ot, (rep, cnt) in groups.items():
                if _lev1(t, ot) or t == ot:
                    truth[(i, rep)] = (0 if t == ot else 1, cnt)
        out = self._inc(spark, old, new, hot_key_cap=100_000)
        assert out == truth, (
            f"missed={set(truth) - set(out)} spurious={set(out) - set(truth)}"
        )


class TestBandTableRetraction:
    """The round-10 ADVICE-low finding: pairs_from_band_table (the
    cluster purge's re-derivation over the persisted band table) was an
    unguarded band self-join — a boilerplate band made the retraction
    O(n²) and its semantics diverged from the guarded build path. It now
    applies the same bounded-work tiers as minhash_neardup_pairs:
    all-pairs below max_bucket, a sub-banding second pass when the table
    carries the packed ``sig`` (what cluster_ingest_sink persists), and
    a min-id star for residual hot buckets; legacy 3-column tables go
    straight to the star tier. These cases fail on the unguarded
    self-join (boilerplate case emits C(n,2)=15 pairs, not n-1=5)."""

    def _docs(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id LONG, text STRING")

    def test_parity_with_build_path_when_no_guard_fires(self, spark):
        from is3107datapipelineproject_spark.operators.dedup import (
            band_signature_frame,
            minhash_neardup_pairs,
            pairs_from_band_table,
        )

        ta = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
        tb = ta.replace("india", "oscar")
        tc = "one two three four five six seven eight nine ten eleven twelve"
        docs = self._docs(spark, [(1, ta), (2, ta), (3, tb), (4, tc), (9, tc)])
        want = {
            (r.doc1, r.doc2, r.jaccard)
            for r in minhash_neardup_pairs(docs, "text", "doc_id", threshold=0.5).collect()
        }
        for with_sig in (True, False):
            table = band_signature_frame(docs, "text", "doc_id", with_sig=with_sig)
            got = {
                (r.doc1, r.doc2, r.jaccard)
                for r in pairs_from_band_table(table, threshold=0.5).collect()
            }
            assert got == want and len(got) >= 2, f"with_sig={with_sig}"

    def test_hot_band_degrades_to_star_not_quadratic(self, spark):
        from is3107datapipelineproject_spark.operators.dedup import (
            band_signature_frame,
            pairs_from_band_table,
        )

        # 6 identical docs: every band (and every sub-band) is one hot
        # bucket. With max_bucket=4 the guard must emit the 5-edge star
        # to the min id, NOT the 15-edge clique — yet keep the cluster
        # connected (retraction only needs connectivity).
        t = "quick brown fox jumps over the lazy dog again and again ok"
        docs = self._docs(spark, [(i, t) for i in (7, 3, 11, 5, 9, 13)])
        star = {(3, d) for d in (5, 7, 9, 11, 13)}
        for with_sig in (True, False):
            table = band_signature_frame(docs, "text", "doc_id", with_sig=with_sig)
            got = {
                (r.doc1, r.doc2)
                for r in pairs_from_band_table(table, max_bucket=4).collect()
            }
            assert got == star, f"with_sig={with_sig}: {got}"

    def test_purge_rederivation_over_hot_state_stays_bounded(self, spark, tmp_path):
        from is3107datapipelineproject_spark.operators.dedup import (
            minhash_neardup_pairs,
            neardup_clusters,
        )
        from is3107datapipelineproject_spark.streaming import windows as W

        # end to end: ingest a boilerplate-heavy corpus through the
        # cluster sink (persists sig), purge one member — the label
        # rewrite re-derives pairs from the band table through the
        # guarded path and must still equal one-shot-over-survivors.
        t = "quick brown fox jumps over the lazy dog again and again ok"
        u = "completely different text about ships and harbors at dawn yes"
        rows = [(i, t) for i in (0, 1, 2, 4, 5, 6)] + [(8, u)]
        sig_dir = str(tmp_path / "hot_sigs")
        labels_dir = str(tmp_path / "hot_labels")
        sink = W.cluster_ingest_sink(sig_dir, labels_dir)
        sink(spark.createDataFrame(rows, "doc_id LONG, text STRING"), 0)
        assert "sig" in spark.read.parquet(sig_dir).columns
        W.cluster_purge_state(
            spark, labels_dir, sig_dir, spark.createDataFrame([(0,)], "doc_id LONG")
        )
        surv = spark.createDataFrame(
            [r for r in rows if r[0] != 0], "doc_id LONG, text STRING"
        )
        want = {
            (r.doc_id, r.cluster_id)
            for r in neardup_clusters(
                surv, minhash_neardup_pairs(surv, "text", "doc_id"), "doc_id"
            ).collect()
        }
        got = {
            (r.doc_id, r.cluster_id)
            for r in W.cluster_labels_read(spark, labels_dir).collect()
        }
        assert got == want == {(i, 1) for i in (1, 2, 4, 5, 6)} | {(8, 8)}

    def test_mixed_legacy_sig_hot_band_fails_loud(self, spark):
        """Round-10 review fix: legacy 3-column batches mixed into a
        with_sig band table read as sig=NULL; the sub-banding pass
        cannot split those rows (concat_ws collapses every NULL-sig doc
        into one degenerate key) and would silently drop cross-era
        pairs in the hot band — the guard raises with the migration
        path instead. Small buckets are unaffected (sig unused there)."""
        import pytest as _pytest

        from is3107datapipelineproject_spark.operators.dedup import (
            band_signature_frame,
            pairs_from_band_table,
        )

        t = "quick brown fox jumps over the lazy dog again and again ok"
        newer = band_signature_frame(
            self._docs(spark, [(i, t) for i in (1, 2, 3)]), "text", "doc_id", with_sig=True
        )
        legacy = band_signature_frame(
            self._docs(spark, [(i, t) for i in (11, 12, 13)]), "text", "doc_id"
        ).select("doc_id", "hs", F.lit(None).cast("array<bigint>").alias("sig"), "band")
        mixed = newer.unionByName(legacy)
        with _pytest.raises(ValueError, match="NULL sig"):
            pairs_from_band_table(mixed, max_bucket=4).collect()
        # below the hot threshold the mixed table is fine (sig unused)
        got = {
            (r.doc1, r.doc2)
            for r in pairs_from_band_table(mixed, max_bucket=1024).collect()
        }
        assert len(got) == 15  # C(6,2): all-pairs within the shared band


class TestBlockedJaccardBoundaries:
    """Round-11 battery for blocked_jaccard_pairs, reworked from a raw
    within-block self-join (quadratic in corpus size inside every
    block) to PPJoin prefix filtering on the composite (block, token)
    key. Every prune must stay lossless, block confinement must hold,
    and the hot-block degenerate case must raise, not silently
    quadratic.

    ``KW`` parametrizes the materialization mode: the Durable subclass
    re-runs the ENTIRE battery through ``durable=True`` (persist
    DISK_ONLY, lineage retained for executor-loss recovery) and must be
    bit-identical — the flag changes fault-tolerance, never values."""

    KW: dict = {}

    @classmethod
    def _run(cls, spark, rows, **kw):
        from is3107datapipelineproject_spark.operators.dedup import blocked_jaccard_pairs

        df = spark.createDataFrame(rows, ["doc_id", "src", "text"])
        out = blocked_jaccard_pairs(
            df, "text", "doc_id", "src", threshold=0.5, **{**cls.KW, **kw}
        )
        return {(r.doc1, r.doc2): float(r.jaccard) for r in out.collect()}

    def test_pair_exactly_at_tau_kept(self, spark):
        # |x|=3, |y|=3, i=2 -> J = 2/4 = 0.5 exactly: the tau-1e-4
        # filter slack must not prune a pair AT the threshold
        x = "alpha beta gamma"
        y = "alpha beta delta"
        assert self._run(spark, [(1, "b0", x), (2, "b0", y)]) == {(1, 2): 0.5}

    def test_pair_just_below_tau_dropped(self, spark):
        # |x|=3, |y|=4, i=2 -> J = 2/5 = 0.4 < 0.5: dropped by the
        # exact verify, present or not in the candidate set
        x = "alpha beta gamma"
        y = "alpha beta delta epsilon"
        assert self._run(spark, [(1, "b0", x), (2, "b0", y)]) == {}

    def test_identical_docs_in_different_blocks_never_pair(self, spark):
        # block confinement: byte-equal docs across blocks are NOT a
        # pair (they share every token, so a candidate join missing the
        # block key would fire)
        t = "one two three four"
        rows = [(1, "b0", t), (2, "b1", t), (3, "b0", t)]
        assert self._run(spark, rows) == {(1, 3): 1.0}

    def test_per_block_df_order_consistent_with_decoy_block(self, spark):
        """The token order is per-block (block df ASC, token). A decoy
        block where the tested pair's SHARED tokens are ultra-common
        must not perturb block b0's prefix: inside b0 each doc's own
        unshared token (df=1) sorts first and the shared tokens fill
        the rest of the prefix — the pair is found via a shared token
        at the last prefix slot. A global-df order would push the
        decoy-inflated shared tokens out of b0's prefixes entirely on
        one side only if the two sides disagreed; this asserts they
        cannot."""
        shared = [f"s{i:02d}" for i in range(9)]
        x = " ".join(["only_x"] + shared)
        y = " ".join(["only_y"] + shared)
        rows = [(1, "b0", x), (2, "b0", y)]
        # decoy block: every shared token appears in 40 docs
        rows += [(100 + i, "decoy", " ".join(shared)) for i in range(40)]
        out = self._run(spark, rows, max_prefix_posting=100)
        assert out[(1, 2)] == round(9 / 11, 4)

    def test_hot_block_cap_edge(self, spark):
        # a block of n docs sharing every token except one: every
        # shared token's (block, token) posting ~ block size. At the
        # cap all C(n,2) pairs come back; one past it raises toward
        # exact-dedup-first instead of running the quadratic.
        from is3107datapipelineproject_spark.operators.dedup import blocked_jaccard_pairs

        n = 8
        rows = [(i, "hot", f"hot1 hot2 hot3 hot4 uniq{i}") for i in range(n)]
        df = spark.createDataFrame(rows, ["doc_id", "src", "text"])
        got = blocked_jaccard_pairs(
            df, "text", "doc_id", "src", threshold=0.5, max_prefix_posting=n, **self.KW
        )
        assert got.count() == n * (n - 1) // 2  # J = 4/6 = 0.6667 each
        with pytest.raises(ValueError, match="exact_dedup first"):
            blocked_jaccard_pairs(
                df, "text", "doc_id", "src", threshold=0.5, max_prefix_posting=n - 1, **self.KW
            ).count()

    def test_seeded_random_corpus_matches_brute_force(self, spark):
        """Seeded random corpus over 4 blocks, brute-force per-block
        Jaccard as ground truth — the same cross-check contract every
        other blocked tier in this file carries."""
        rng = random.Random(11)
        vocab = [f"w{i:02d}" for i in range(30)]
        rows = []
        for i in range(60):
            toks = rng.sample(vocab, rng.randint(2, 10))
            rows.append((i, f"b{rng.randrange(4)}", " ".join(toks)))
        truth = {}
        sets = {i: (b, frozenset(t.split())) for i, b, t in rows}
        for i in sets:
            for j in sets:
                if i < j and sets[i][0] == sets[j][0]:
                    si, sj = sets[i][1], sets[j][1]
                    u = len(si | sj)
                    jac = round(len(si & sj) / u, 4) if u else None
                    if jac is not None and jac >= 0.5:
                        truth[(i, j)] = jac
        assert self._run(spark, rows) == truth


class TestBlockedJaccardBoundariesDurable(TestBlockedJaccardBoundaries):
    """Round-12 (verdict item 3): the whole τ-boundary battery re-run
    through the DURABLE materialization path (persist DISK_ONLY instead
    of eager localCheckpoint) — every assertion, including the planted
    τ-edge fixtures, the hot-cap edge and the seeded brute-force
    parity, must hold bit-identically. The flag exists for clusters
    where lineage-free checkpoint blocks turn an executor loss into a
    job failure; it must never change a single pair."""

    KW = {"durable": True}


class TestPrefixJaccardDurableParity:
    """prefix_jaccard_pairs' durable path: same-output check against
    the default path on a seeded corpus (the global tier's boundary
    coverage lives in TestPrefixJaccardTauBoundary; here the contract
    under test is durable == default, bit for bit)."""

    def test_durable_matches_default(self, spark):
        from is3107datapipelineproject_spark.operators.dedup import prefix_jaccard_pairs

        rng = random.Random(23)
        vocab = [f"w{i:02d}" for i in range(40)]
        rows = [
            (i, " ".join(rng.sample(vocab, rng.randint(3, 12)))) for i in range(80)
        ]
        # plant near-dups so the parity check is never vacuous: every
        # 10th doc gets a copy with one extra token (J well above 0.6)
        rows += [(1000 + i, t + " extra") for i, t in rows if i % 10 == 0]
        df = spark.createDataFrame(rows, ["doc_id", "text"])

        def run(**kw):
            out = prefix_jaccard_pairs(
                df, "text", "doc_id", threshold=0.6, shingles=False, **kw
            )
            return {(r.doc1, r.doc2): float(r.jaccard) for r in out.collect()}

        base = run()
        assert base, "fixture must produce pairs or the parity check is vacuous"
        assert run(durable=True) == base


class TestIncrementalBlockedJaccardBoundaries:
    """Round-11 incremental tier of the blocked family: new×old within
    the shared block only — brute-force parity, block confinement,
    never old×old, and the (block, token) posting-cap edge."""

    @staticmethod
    def _run(spark, old, new, **kw):
        from is3107datapipelineproject_spark.operators.dedup import (
            incremental_blocked_jaccard,
        )

        cols = ["doc_id", "src", "text"]
        out = incremental_blocked_jaccard(
            spark.createDataFrame(old, cols),
            spark.createDataFrame(new, cols),
            "text",
            "doc_id",
            "src",
            threshold=0.5,
            **kw,
        )
        return {(r.new_id, r.old_id): float(r.jaccard) for r in out.collect()}

    def test_block_confinement_and_no_old_x_old(self, spark):
        t = "one two three four"
        old = [(1, "b0", t), (2, "b0", t), (3, "b1", t)]
        new = [(10, "b0", t), (11, "b2", t)]
        # old 1 and 2 are an exact pair but must NOT appear (old×old);
        # new 11's block b2 has no corpus members; new 10 pairs with both
        # b0 corpus docs only
        assert self._run(spark, old, new) == {(10, 1): 1.0, (10, 2): 1.0}

    def test_at_tau_kept_below_dropped(self, spark):
        old = [(1, "b0", "alpha beta gamma"), (2, "b0", "alpha beta delta epsilon")]
        new = [(10, "b0", "alpha beta zeta")]
        # (10,1): i=2, union 4 -> 0.5 kept; (10,2): i=2, union 5 -> 0.4 dropped
        assert self._run(spark, old, new) == {(10, 1): 0.5}

    def test_posting_cap_edge(self, spark):
        import pytest as _pytest

        n = 8
        old = [(i, "hot", f"hot1 hot2 hot3 hot4 uniq{i}") for i in range(n)]
        new = [(100, "hot", "hot1 hot2 hot3 hot4 uniqx")]
        got = self._run(spark, old, new, max_prefix_posting=n)
        assert len(got) == n  # J = 4/6 vs every corpus member
        with _pytest.raises(ValueError, match="exact_dedup first"):
            self._run(spark, old, new, max_prefix_posting=n - 1)

    def test_seeded_random_matches_brute_force(self, spark):
        rng = random.Random(23)
        vocab = [f"w{i:02d}" for i in range(25)]
        rows = [
            (i, f"b{rng.randrange(3)}", " ".join(rng.sample(vocab, rng.randint(2, 9))))
            for i in range(50)
        ]
        old = [r for r in rows if r[0] % 4 != 0]
        new = [r for r in rows if r[0] % 4 == 0]
        truth = {}
        for ni, nb, nt in new:
            for oi, ob, ot in old:
                if nb != ob:
                    continue
                sn, so = set(nt.split()), set(ot.split())
                u = len(sn | so)
                jac = round(len(sn & so) / u, 4) if u else None
                if jac is not None and jac >= 0.5:
                    truth[(ni, oi)] = jac
        assert self._run(spark, old, new) == truth


class TestBlockedJaccardMultiMembership:
    """Round-11 review catch: the PPJoin rework must keep the raw-join
    formulation's multi-membership semantics — a doc_id listed under
    SEVERAL blocks (doc-per-cluster blocking frames) builds an
    independent prefix per (doc, block) row, with per-block size/m and
    per-block verification. A doc-level window would compute m across
    memberships, silently dropping J=1.0 pairs."""

    def test_doc_in_two_blocks_pairs_in_each(self, spark):
        from is3107datapipelineproject_spark.operators.dedup import blocked_jaccard_pairs

        rows = [
            (1, "A", "alpha beta gamma delta"),
            (1, "B", "epsilon zeta eta theta"),
            (2, "A", "alpha beta gamma delta"),   # identical to 1's A row
            (3, "B", "epsilon zeta eta theta"),   # identical to 1's B row
            (4, "B", "completely different words entirely"),
        ]
        df = spark.createDataFrame(rows, ["doc_id", "src", "text"])
        out = blocked_jaccard_pairs(df, "text", "doc_id", "src", threshold=0.5)
        got = {(r.doc1, r.doc2, float(r.jaccard)) for r in out.collect()}
        assert got == {(1, 2, 1.0), (1, 3, 1.0)}

    def test_pair_sharing_two_blocks_returns_one_row_per_block(self, spark):
        from is3107datapipelineproject_spark.operators.dedup import blocked_jaccard_pairs

        t = "one two three four"
        rows = [(1, "A", t), (1, "B", t), (2, "A", t), (2, "B", t)]
        df = spark.createDataFrame(rows, ["doc_id", "src", "text"])
        out = blocked_jaccard_pairs(df, "text", "doc_id", "src", threshold=0.5)
        rows_out = [(r.doc1, r.doc2, float(r.jaccard)) for r in out.collect()]
        assert sorted(rows_out) == [(1, 2, 1.0), (1, 2, 1.0)]  # per-block, as the raw join
