"""Persisted LSH band index (operators/dedup_index.py): build → decide
equality vs the direct cross-corpus pipeline, append-vs-rebuild
equality, broadcast-gate path equivalence, phantom-candidate safety,
and the streaming ingest's replay convergence."""

import os

import pytest
from pyspark.sql import functions as F

from fuse_query_spark.operators.dedup import (
    jaccard_verify,
    lsh_cross_candidate_pairs_md5,
    minhash_signatures_md5,
)
from fuse_query_spark.operators.dedup_index import (
    dedup_against_index,
    ingest_dedup_stream,
    lsh_index_append,
    lsh_index_candidates,
    lsh_index_write,
)
from fuse_query_spark.sources.tables import table

K, BANDS, T = 8, 4, 0.2


def _split(spark, sf_dir):
    d = table(spark, sf_dir, "documents").select("doc_id", "text", "source")
    new = d.filter(F.col("source").isin("src0", "src1"))
    base = d.filter(~F.col("source").isin("src0", "src1"))
    return d, new, base


def _direct_decisions(d, new, base):
    """Reference result via the index-free cross-corpus pipeline."""
    pairs = lsh_cross_candidate_pairs_md5(
        minhash_signatures_md5(new, k=K),
        minhash_signatures_md5(base, k=K),
        k=K,
        bands=BANDS,
    ).select(F.col("id_new").alias("id_a"), F.col("id_base").alias("id_b"))
    ver = jaccard_verify(d, pairs, threshold=T)
    agg = {
        r.id_new: r
        for r in ver.groupBy(F.col("id_a").alias("id_new"))
        .agg(
            F.count(F.lit(1)).alias("n_matches"),
            F.max("jaccard").alias("best_jaccard"),
            F.min("id_b").alias("min_base"),
        )
        .collect()
    }
    out = {}
    for r in new.select("doc_id").collect():
        m = agg.get(r.doc_id)
        out[r.doc_id] = (
            (m.n_matches, round(m.best_jaccard, 9), m.min_base, True)
            if m
            else (0, 0.0, -1, False)
        )
    return out


def _collect_decisions(df):
    return {
        r.id_new: (r.n_matches, round(r.best_jaccard, 9), r.min_base, r.is_dup)
        for r in df.collect()
    }


class TestIndexBatch:
    def test_index_matches_direct_cross_corpus(self, spark, sf_dir, tmp_path):
        d, new, base = _split(spark, sf_dir)
        path = str(tmp_path / "idx")
        lsh_index_write(base, path, k=K, bands=BANDS)
        got = _collect_decisions(
            dedup_against_index(new, base, spark, path, k=K, bands=BANDS, threshold=T)
        )
        want = _direct_decisions(d, new, base)
        assert got == want
        assert any(v[3] for v in got.values()), "corpus plants cross-source near-dups"
        assert any(not v[3] for v in got.values())

    def test_append_equals_rebuild(self, spark, sf_dir, tmp_path):
        _, new, base = _split(spark, sf_dir)
        h1 = new.filter(F.col("doc_id") % 2 == 0)
        h2 = new.filter(F.col("doc_id") % 2 == 1)
        grown = base.unionByName(h1)

        inc = str(tmp_path / "inc")
        lsh_index_write(base, inc, k=K, bands=BANDS)
        lsh_index_append(h1, inc, k=K, bands=BANDS)
        got = _collect_decisions(
            dedup_against_index(h2, grown, spark, inc, k=K, bands=BANDS, threshold=T)
        )

        reb = str(tmp_path / "reb")
        lsh_index_write(grown, reb, k=K, bands=BANDS)
        want = _collect_decisions(
            dedup_against_index(h2, grown, spark, reb, k=K, bands=BANDS, threshold=T)
        )
        assert got == want

    def test_duplicate_appends_are_idempotent(self, spark, sf_dir, tmp_path):
        """A replayed append duplicates band rows; candidates must not
        change (the DISTINCT contract the replay story leans on)."""
        _, new, base = _split(spark, sf_dir)
        path = str(tmp_path / "idx")
        lsh_index_write(base, path, k=K, bands=BANDS)
        before = {
            (r.id_new, r.id_base)
            for r in lsh_index_candidates(new, spark, path, k=K, bands=BANDS).collect()
        }
        lsh_index_append(base.limit(50), path, k=K, bands=BANDS)
        after = {
            (r.id_new, r.id_base)
            for r in lsh_index_candidates(new, spark, path, k=K, bands=BANDS).collect()
        }
        assert before == after

    def test_broadcast_gate_paths_agree(self, spark, sf_dir, tmp_path):
        _, new, base = _split(spark, sf_dir)
        path = str(tmp_path / "idx")
        lsh_index_write(base, path, k=K, bands=BANDS)
        bcast = {
            (r.id_new, r.id_base)
            for r in lsh_index_candidates(new, spark, path, k=K, bands=BANDS).collect()
        }
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            shuffled = {
                (r.id_new, r.id_base)
                for r in lsh_index_candidates(
                    new, spark, path, k=K, bands=BANDS
                ).collect()
            }
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        assert bcast == shuffled and bcast

    def test_xxhash64_fast_path(self, spark, sf_dir, tmp_path):
        """hasher='xx' (long band hashes, ~2x smaller index): exact
        copies have identical shingle sets, hence identical signatures,
        hence collide in EVERY band under ANY hash family — so a batch
        of re-issued base docs must come back all-dup at jaccard 1.0
        under both hashers; incremental append equals rebuild under xx
        too; and a hash-family mismatch against the sidecar raises."""
        _, new, base = _split(spark, sf_dir)
        copies = base.limit(5).select(
            (F.col("doc_id") + 10_000_000).alias("doc_id"), "text", "source"
        )
        for hasher, sub in (("xx", "xx"), ("md5", "m5")):
            p = str(tmp_path / sub)
            lsh_index_write(base, p, k=K, bands=BANDS, hasher=hasher)
            dec = dedup_against_index(
                copies, base, spark, p, k=K, bands=BANDS, threshold=T, hasher=hasher
            )
            rows = dec.collect()
            assert len(rows) == 5
            assert all(r.is_dup and r.best_jaccard == 1.0 for r in rows)
        path = str(tmp_path / "xx")

        h1 = new.filter(F.col("doc_id") % 2 == 0)
        h2 = new.filter(F.col("doc_id") % 2 == 1)
        grown = base.unionByName(h1)
        lsh_index_append(h1, path, k=K, bands=BANDS, hasher="xx")
        got = _collect_decisions(
            dedup_against_index(h2, grown, spark, path, k=K, bands=BANDS,
                                threshold=T, hasher="xx")
        )
        reb = str(tmp_path / "xxreb")
        lsh_index_write(grown, reb, k=K, bands=BANDS, hasher="xx")
        want = _collect_decisions(
            dedup_against_index(h2, grown, spark, reb, k=K, bands=BANDS,
                                threshold=T, hasher="xx")
        )
        assert got == want

        with pytest.raises(ValueError, match="band hashes cannot match"):
            lsh_index_candidates(new, spark, path, k=K, bands=BANDS)  # md5 vs xx
        with pytest.raises(ValueError, match="expected 'md5' or 'xx'"):
            lsh_index_write(base, str(tmp_path / "bad"), hasher="sha1")

    def test_partial_sidecar_is_best_effort(self, spark, sf_dir, tmp_path):
        """advisor r8: a sidecar from an older writer that lacks a key
        must PASS on the keys it does carry (best-effort by design,
        like the missing-file case) — but a mismatch on a key both
        sides know still raises."""
        import json

        _, new, base = _split(spark, sf_dir)
        path = str(tmp_path / "idx")
        lsh_index_write(base, path, k=K, bands=BANDS)
        meta = json.load(open(f"{path}/_index_meta.json"))
        del meta["shingle_n"]
        json.dump(meta, open(f"{path}/_index_meta.json", "w"))
        # shingle_n no longer checkable -> a mismatched value passes
        # the check (and matching values on the remaining keys pass)
        assert lsh_index_candidates(
            new, spark, path, k=K, bands=BANDS, shingle_n=5
        ).columns == ["id_new", "id_base"]
        # a key both sides carry still fails loudly
        with pytest.raises(ValueError, match="band hashes cannot match"):
            lsh_index_candidates(new, spark, path, k=16, bands=BANDS)

    def test_parameter_mismatch_raises(self, spark, sf_dir, tmp_path):
        """Mismatched (k, bands, shingle_n) can never collide with the
        index's band hashes — zero candidates would silently disable
        dedup, so the sidecar check must fail loudly instead."""
        _, new, base = _split(spark, sf_dir)
        path = str(tmp_path / "idx")
        lsh_index_write(base, path, k=K, bands=BANDS)
        for kw in ({"k": 16, "bands": BANDS}, {"k": K, "bands": 2},
                   {"k": K, "bands": BANDS, "shingle_n": 5}):
            with pytest.raises(ValueError, match="band hashes cannot match"):
                lsh_index_candidates(new, spark, path, **kw)
            with pytest.raises(ValueError, match="band hashes cannot match"):
                lsh_index_append(new, path, **kw)

    def test_candidate_plan_broadcasts_batch_not_index(self, spark, sf_dir, tmp_path):
        """Plan gate: under the size gate the BATCH side broadcasts
        into the index scan (BroadcastHashJoin) — the index is never
        shuffled; past the gate the join degrades to a shuffled hash
        join, still never a sort-merge over the index."""
        _, new, base = _split(spark, sf_dir)
        path = str(tmp_path / "idx")
        lsh_index_write(base, path, k=K, bands=BANDS)
        plan = lsh_index_candidates(
            new, spark, path, k=K, bands=BANDS
        )._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            plan2 = lsh_index_candidates(
                new, spark, path, k=K, bands=BANDS
            )._jdf.queryExecution().executedPlan().toString()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        assert "ShuffledHashJoin" in plan2 and "SortMergeJoin" not in plan2

    def test_small_candidate_set_prunes_corpus_scan(self, spark, sf_dir, tmp_path):
        """r9 plan gate: with a small candidate set the corpus
        re-shingle prune is a literal In(doc_id, ...) filter that
        reaches the parquet FileScan (row-group pruning on the
        id-clustered files batch appends produce) — no join that scans
        every corpus row, and NO SortMergeJoin anywhere in the decide
        (the r9 probe caught the prune as a SortMergeJoin that
        shuffled the whole corpus text: slope 3.7 vs linear, 24 GB
        peak). Decisions equal the join path's (forced via the limit)."""
        import fuse_query_spark.operators.dedup_index as dix

        _, new, base = _split(spark, sf_dir)
        corpus_path = str(tmp_path / "corpus")
        base.write.parquet(corpus_path)
        corpus = spark.read.parquet(corpus_path)
        path = str(tmp_path / "idx")
        lsh_index_write(corpus, path, k=K, bands=BANDS)
        dec = dedup_against_index(new, corpus, spark, path, k=K, bands=BANDS, threshold=T)
        plan = dec._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" not in plan
        scans = [ln for ln in plan.splitlines() if "FileScan parquet" in ln and "text" in ln]
        assert any("doc_id" in ln and " IN (" in ln for ln in scans), scans
        want = _collect_decisions(dec)
        old = dix._ISIN_PRUNE_LIMIT
        dix._ISIN_PRUNE_LIMIT = 0  # force the gated-join path
        try:
            got = _collect_decisions(
                dedup_against_index(new, corpus, spark, path, k=K, bands=BANDS, threshold=T)
            )
        finally:
            dix._ISIN_PRUNE_LIMIT = old
        assert got == want

    def test_phantom_bands_do_not_drop_docs(self, spark, sf_dir, tmp_path):
        """Bands in the index without landed text (a crash between the
        index append and the corpus append) must NOT mark the replayed
        doc a dup — the two-sided verify drops the phantom candidate."""
        _, new, base = _split(spark, sf_dir)
        path = str(tmp_path / "idx")
        lsh_index_write(base, path, k=K, bands=BANDS)
        # probe = new docs with NO base match at all, so the ONLY index
        # hit after the phantom append is the doc's own band rows
        clean = dedup_against_index(
            new, base, spark, path, k=K, bands=BANDS, threshold=T
        ).filter(~F.col("is_dup"))
        probe_ids = [r.id_new for r in clean.limit(5).collect()]
        assert probe_ids
        probe = new.filter(F.col("doc_id").isin(probe_ids))
        lsh_index_append(probe, path, k=K, bands=BANDS)  # bands, no text
        dec = dedup_against_index(
            probe, base, spark, path, k=K, bands=BANDS, threshold=T
        )
        assert all(not r.is_dup for r in dec.collect())


class TestIngestStream:
    def test_cold_start_bootstraps_corpus_and_index(self, spark, sf_dir, tmp_path):
        """A brand-new pipeline (no corpus, no index) keeps the whole
        first batch and CREATES both zones; the second batch dedups
        against the first."""
        _, new, _ = _split(spark, sf_dir)
        h1 = new.filter(F.col("doc_id") % 2 == 0).select("doc_id", "text")
        # batch 2 = batch 1's docs re-crawled under new ids (+1 shift
        # keeps ids disjoint) — every one a jaccard-1.0 dup of batch 1
        h2 = h1.select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text")
        idx, corpus, decisions, inbox = (
            str(tmp_path / d) for d in ("idx", "corpus", "decisions", "in")
        )
        h1.coalesce(1).write.parquet(inbox)
        h2.coalesce(1).write.mode("append").parquet(inbox)
        n1 = h1.count()
        stream = (
            spark.readStream.schema("doc_id LONG, text STRING")
            .option("maxFilesPerTrigger", 1)
            .parquet(inbox)
        )
        ingest_dedup_stream(
            stream, spark, idx, corpus, decisions,
            str(tmp_path / "ckpt"), k=K, bands=BANDS, threshold=T,
        )
        landed = {r.doc_id for r in spark.read.parquet(corpus).collect()}
        # micro-batch order is file order: h1 bootstraps, h2 all-dups.
        # (If Spark ever batched them together, intra-batch docs would
        # all be kept — the count assertion below would catch it.)
        assert landed == {r.doc_id for r in h1.collect()}
        assert len(landed) == n1
        dec = spark.read.parquet(decisions)
        assert dec.filter(~F.col("is_dup")).count() == n1
        assert dec.filter(F.col("is_dup") & (F.col("best_jaccard") == 1.0)).count() == n1

    def _land_dirs(self, tmp_path):
        return (
            str(tmp_path / "idx"),
            str(tmp_path / "corpus"),
            str(tmp_path / "decisions"),
            str(tmp_path / "in"),
        )

    def test_seeded_corpus_without_index_raises(self, spark, sf_dir, tmp_path):
        """A landed corpus with NO index is not a cold start: deciding
        would keep everything and bootstrap an index blind to every
        seeded doc forever — the stream must fail loudly instead."""
        _, new, base = _split(spark, sf_dir)
        corpus = str(tmp_path / "corpus")
        base.select("doc_id", "text").write.parquet(corpus)
        inbox = str(tmp_path / "in")
        new.select("doc_id", "text").coalesce(1).write.parquet(inbox)
        stream = spark.readStream.schema("doc_id LONG, text STRING").parquet(inbox)
        from pyspark.sql.utils import StreamingQueryException

        with pytest.raises(StreamingQueryException, match="unindexed"):
            ingest_dedup_stream(
                stream, spark, str(tmp_path / "idx"), corpus,
                str(tmp_path / "dec"), str(tmp_path / "ckpt"),
                k=K, bands=BANDS, threshold=T,
            )

    def test_stream_matches_sequential_batches_and_replay_converges(
        self, spark, sf_dir, tmp_path
    ):
        _, new, base = _split(spark, sf_dir)
        base = base.select("doc_id", "text")
        h1 = new.filter(F.col("doc_id") % 2 == 0).select("doc_id", "text")
        h2 = new.filter(F.col("doc_id") % 2 == 1).select("doc_id", "text")
        idx, corpus, decisions, inbox = self._land_dirs(tmp_path)

        base.write.parquet(corpus)
        lsh_index_write(spark.read.parquet(corpus), idx, k=K, bands=BANDS)
        # two input files → two micro-batches under maxFilesPerTrigger=1
        h1.coalesce(1).write.parquet(inbox)
        h2.coalesce(1).write.mode("append").parquet(inbox)

        stream = (
            spark.readStream.schema("doc_id LONG, text STRING")
            .option("maxFilesPerTrigger", 1)
            .parquet(inbox)
        )
        ingest_dedup_stream(
            stream, spark, idx, corpus, decisions,
            str(tmp_path / "ckpt1"), k=K, bands=BANDS, threshold=T,
        )
        landed = spark.read.parquet(corpus)
        ids = [r.doc_id for r in landed.select("doc_id").collect()]
        assert len(ids) == len(set(ids)), "no duplicate doc_ids after ingest"

        # sequential-batch twin on separate dirs
        idx2, corpus2 = str(tmp_path / "idx2"), str(tmp_path / "corpus2")
        base.write.parquet(corpus2)
        lsh_index_write(base, idx2, k=K, bands=BANDS)
        expect_ids = set(r.doc_id for r in base.select("doc_id").collect())
        for half in (h1, h2):
            c = spark.read.parquet(corpus2)
            dec = dedup_against_index(half, c, spark, idx2, k=K, bands=BANDS, threshold=T)
            kept = half.join(
                dec.filter(~F.col("is_dup")).select(F.col("id_new").alias("doc_id")),
                "doc_id",
                "left_semi",
            )
            lsh_index_append(kept, idx2, k=K, bands=BANDS)
            kept.write.mode("append").parquet(corpus2)
            expect_ids |= {r.doc_id for r in kept.select("doc_id").collect()}
        assert set(ids) == expect_ids

        # FRESH-checkpoint replay of the same inbox: every replayed doc
        # matches its own landed copy at jaccard 1.0 → corpus converges
        n_before = landed.count()
        stream2 = (
            spark.readStream.schema("doc_id LONG, text STRING")
            .option("maxFilesPerTrigger", 1)
            .parquet(inbox)
        )
        ingest_dedup_stream(
            stream2, spark, idx, corpus, decisions,
            str(tmp_path / "ckpt2"), k=K, bands=BANDS, threshold=T,
        )
        assert spark.read.parquet(corpus).count() == n_before
        # the replay's decisions are in the audit log as is_dup rows
        dec_log = spark.read.parquet(decisions)
        assert dec_log.filter(F.col("is_dup") & (F.col("best_jaccard") == 1.0)).count() > 0

        # SAME-checkpoint restart: the sink's commit log says both
        # batches are done, so availableNow drains nothing — corpus
        # AND decisions log are byte-identical (no dup audit rows,
        # unlike the fresh-checkpoint replay above)
        n_dec = dec_log.count()
        stream3 = (
            spark.readStream.schema("doc_id LONG, text STRING")
            .option("maxFilesPerTrigger", 1)
            .parquet(inbox)
        )
        ingest_dedup_stream(
            stream3, spark, idx, corpus, decisions,
            str(tmp_path / "ckpt2"), k=K, bands=BANDS, threshold=T,
        )
        assert spark.read.parquet(corpus).count() == n_before
        assert spark.read.parquet(decisions).count() == n_dec

    def test_intra_batch_drop_lands_one_copy(self, spark, sf_dir, tmp_path):
        """Two near-dups arriving in the SAME micro-batch: the r8
        boundary. intra_batch='drop' lands exactly the smallest-id
        copy; the dropped doc gets an is_dup audit row whose min_base
        names the surviving batch doc; a fresh-checkpoint replay still
        converges (deterministic split + jaccard-1.0 self-match)."""
        # synthetic docs with DISJOINT vocabularies (corpus docs carry
        # planted near-dups that would intra-drop each other): uniques
        # are mutually jaccard-0; each copy is jaccard-1.0 of exactly
        # its original
        n_uniq = 20
        uniq_rows = [
            (i, " ".join(f"w{i}x{j}" for j in range(30))) for i in range(n_uniq)
        ]
        uniques = spark.createDataFrame(uniq_rows, "doc_id: long, text: string")
        # exact in-batch copies under new ids: same text → same
        # signatures → candidate pair in every band, jaccard 1.0
        copies = uniques.select((F.col("doc_id") + 5_000_000).alias("doc_id"), "text")
        batch = uniques.unionByName(copies)
        idx, corpus, decisions, inbox = self._land_dirs(tmp_path)
        batch.coalesce(1).write.parquet(inbox)

        def _run(ckpt):
            stream = spark.readStream.schema("doc_id LONG, text STRING").parquet(inbox)
            ingest_dedup_stream(
                stream, spark, idx, corpus, decisions, str(tmp_path / ckpt),
                k=K, bands=BANDS, threshold=T, intra_batch="drop",
            )

        _run("ckpt1")
        landed = {r.doc_id for r in spark.read.parquet(corpus).collect()}
        assert landed == {r.doc_id for r in uniques.collect()}, "smallest ids survive"
        dec = spark.read.parquet(decisions)
        intra = dec.filter(F.col("is_dup") & (F.col("id_new") >= 5_000_000))
        assert intra.count() == n_uniq
        for r in intra.collect():
            assert r.min_base == r.id_new - 5_000_000 and r.best_jaccard == 1.0
        # default keep mode on fresh dirs would land BOTH copies —
        # pin the contrast so the option is observably load-bearing
        idx2, corpus2 = str(tmp_path / "idx_keep"), str(tmp_path / "corpus_keep")
        stream = spark.readStream.schema("doc_id LONG, text STRING").parquet(inbox)
        ingest_dedup_stream(
            stream, spark, idx2, corpus2, str(tmp_path / "dec_keep"),
            str(tmp_path / "ckpt_keep"), k=K, bands=BANDS, threshold=T,
        )
        assert spark.read.parquet(corpus2).count() == 2 * n_uniq
        # fresh-checkpoint replay of the drop pipeline: corpus converges
        _run("ckpt2")
        assert {r.doc_id for r in spark.read.parquet(corpus).collect()} == landed
        import pytest as _pytest

        with _pytest.raises(ValueError, match="expected 'keep' or 'drop'"):
            ingest_dedup_stream(
                spark.readStream.schema("doc_id LONG, text STRING").parquet(inbox),
                spark, idx, corpus, decisions, str(tmp_path / "ckpt3"),
                intra_batch="purge",
            )

    def test_compaction_trigger_fires_and_decisions_hold(self, spark, sf_dir, tmp_path):
        """compact_every_files: a multi-batch ingest crosses the file
        threshold, compaction fires mid-stream (staging+rename swap),
        the sidecar survives, the file count drops, and decisions
        against the compacted index equal a never-compacted twin's."""
        from fuse_query_spark.operators.dedup_index import (
            _index_data_file_count,
            lsh_index_compact,
        )

        _, new, base = _split(spark, sf_dir)
        base = base.select("doc_id", "text")
        parts = [
            new.filter(F.col("doc_id") % 4 == m).select("doc_id", "text") for m in range(4)
        ]
        idx, corpus, decisions, inbox = self._land_dirs(tmp_path)
        base.write.parquet(corpus)
        lsh_index_write(spark.read.parquet(corpus), idx, k=K, bands=BANDS)
        for p in parts:
            p.coalesce(1).write.mode("append").parquet(inbox)
        stream = (
            spark.readStream.schema("doc_id LONG, text STRING")
            .option("maxFilesPerTrigger", 1)
            .parquet(inbox)
        )
        # threshold low enough that appends cross it mid-stream
        ingest_dedup_stream(
            stream, spark, idx, corpus, decisions, str(tmp_path / "ckpt"),
            k=K, bands=BANDS, threshold=T, compact_every_files=2 * BANDS,
        )
        assert _index_data_file_count(idx) <= 2 * BANDS, "last batch compacted"
        import json
        import os

        assert json.load(open(os.path.join(idx, "_index_meta.json")))["k"] == K
        # decisions equal the never-compacted twin: same landed corpus,
        # index rebuilt-from-corpus vs accumulated appends
        idx2, corpus2 = str(tmp_path / "idx2"), str(tmp_path / "corpus2")
        base.write.parquet(corpus2)
        lsh_index_write(base, idx2, k=K, bands=BANDS)
        for p in parts:
            c = spark.read.parquet(corpus2)
            d = dedup_against_index(p, c, spark, idx2, k=K, bands=BANDS, threshold=T)
            kept = p.join(
                d.filter(~F.col("is_dup")).select(F.col("id_new").alias("doc_id")),
                "doc_id", "left_semi",
            )
            lsh_index_append(kept, idx2, k=K, bands=BANDS)
            kept.write.mode("append").parquet(corpus2)
        assert {r.doc_id for r in spark.read.parquet(corpus).collect()} == {
            r.doc_id for r in spark.read.parquet(corpus2).collect()
        }
        # and a probe batch decides identically against both indexes
        probe = parts[0].limit(10)
        got = _collect_decisions(
            dedup_against_index(
                probe, spark.read.parquet(corpus), spark, idx,
                k=K, bands=BANDS, threshold=T,
            )
        )
        want = _collect_decisions(
            dedup_against_index(
                probe, spark.read.parquet(corpus2), spark, idx2,
                k=K, bands=BANDS, threshold=T,
            )
        )
        assert got == want
        # direct compact call on the twin: idempotent decisions too
        lsh_index_compact(spark, idx2, corpus2, k=K, bands=BANDS)
        assert _collect_decisions(
            dedup_against_index(
                probe, spark.read.parquet(corpus2), spark, idx2,
                k=K, bands=BANDS, threshold=T,
            )
        ) == want


class TestSessionIndexCache:
    def test_externally_deleted_cache_dir_self_repairs(self, spark, sf_dir):
        """A stale _IDX_CACHE entry (the cached dir deleted out from
        under the session, e.g. a /tmp reaper) must be REPAIRED by the
        next call, not returned forever: before the advice-r9 fix,
        setdefault handed the dead path back, the fresh build was
        rmtree'd as a 'lost race', and every retry wedged the same way."""
        import shutil

        from fuse_query_spark.queries import dedup as qd

        first = qd.dedup_incremental_index(spark, sf_dir)
        want = _collect_decisions(first)
        key = next(k for k in qd._IDX_CACHE if k[0] == sf_dir)
        cached = qd._IDX_CACHE[key]
        shutil.rmtree(cached)  # the external reaper
        got = _collect_decisions(qd.dedup_incremental_index(spark, sf_dir))
        assert got == want
        repaired = qd._IDX_CACHE[key]
        assert repaired != cached
        assert os.path.isdir(os.path.join(repaired, "bands"))
