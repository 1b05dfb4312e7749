"""KMV distinct-count sketch: kernel properties, batch/SQL parity, and the
applyInPandasWithState streaming operator's cross-run state fold."""

import os

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from dedup.kmv import (
    DEFAULT_K,
    kmv_estimate,
    kmv_fold,
    lang_distinct_kmv,
    streaming_distinct_by_key,
)


class TestKernel:
    def test_exact_below_k(self):
        rng = np.random.default_rng(7)
        for n in (0, 1, 10, 1023):
            h = rng.integers(-(2**63), 2**63, size=n, dtype=np.int64)
            mins = kmv_fold(np.empty(0, np.int64), h, DEFAULT_K)
            kth = int(mins[-1]) if len(mins) else 0
            assert kmv_estimate(len(mins), kth, DEFAULT_K) == float(len(mins))

    def test_estimate_error_bounded(self):
        """Relative error ~1/sqrt(k) on uniform hashes; assert a loose 10%
        at k=1024 over 100k distinct values."""
        rng = np.random.default_rng(11)
        h = rng.integers(-(2**63), 2**63, size=100_000, dtype=np.int64)
        h = np.unique(h)
        mins = kmv_fold(np.empty(0, np.int64), h, 1024)
        est = kmv_estimate(len(mins), int(mins[-1]), 1024)
        assert abs(est - len(h)) / len(h) < 0.10

    def test_fold_is_mergeable(self):
        """Folding in two halves == folding all at once (union, keep k
        smallest) — the mergeability the streaming state relies on."""
        rng = np.random.default_rng(3)
        a = rng.integers(-(2**63), 2**63, size=5000, dtype=np.int64)
        b = rng.integers(-(2**63), 2**63, size=5000, dtype=np.int64)
        two_step = kmv_fold(kmv_fold(np.empty(0, np.int64), a, 256), b, 256)
        one_step = kmv_fold(np.empty(0, np.int64), np.concatenate([a, b]), 256)
        assert np.array_equal(two_step, one_step)


class TestBatch:
    def _corpus(self, spark, n=400):
        pdf = pd.DataFrame(
            {
                "lang": [f"l{i % 3}" for i in range(n)],
                # ~25% duplicated content within each lang
                "content": [f"doc {i % 3} {(i // 3) % (n // 4)}" for i in range(n)],
            }
        )
        return spark.createDataFrame(pdf), pdf

    def test_exact_regime_matches_pandas(self, spark):
        df, pdf = self._corpus(spark)
        got = {
            r["lang"]: r
            for r in lang_distinct_kmv(df, "lang", "content").collect()
        }
        want = pdf.groupby("lang")["content"].agg(["count", "nunique"])
        for lang, row in want.iterrows():
            assert got[lang]["n_docs"] == row["count"]
            assert got[lang]["est_distinct"] == row["nunique"]
            assert got[lang]["dup_rate"] == pytest.approx(
                1 - row["nunique"] / row["count"], abs=1e-6
            )

    def test_approx_regime_sql_matches_kernel_formula(self, spark):
        """Force the approximate regime (k=16 < distincts) and pin the SQL
        estimate to the shared python kmv_estimate on the same hashes."""
        df, pdf = self._corpus(spark)
        k = 16
        n_rows = pdf.groupby("lang").size()
        got = {
            r["lang"]: r["est_distinct"]
            for r in lang_distinct_kmv(df, "lang", "content", k=k).collect()
        }
        hashes = (
            df.select("lang", F.xxhash64("content").alias("h"))
            .distinct()
            .toPandas()
        )
        for lang, grp in hashes.groupby("lang"):
            mins = kmv_fold(np.empty(0, np.int64), grp["h"].to_numpy(np.int64), k)
            # same row-count clamp as the operator
            want = min(int(kmv_estimate(len(mins), int(mins[-1]), k)),
                       int(n_rows[lang]))
            assert got[lang] == want
            # sanity: the estimate is in the right ballpark of the truth
            assert abs(want - grp["h"].nunique()) / grp["h"].nunique() < 0.8


class TestRollup:
    def test_merged_rollup_equals_direct_sketch_every_grouping_set(self, spark):
        """kmv_rollup builds coarse grouping sets by MERGING leaf sketches;
        KMV merge semantics say that must equal a sketch built directly on
        the rollup's rows — pinned here in the approximate regime (k=16 <
        distincts), where a merge bug (e.g. missing re-distinct or re-cap)
        would shift the k-th minimum and the estimate."""
        from dedup.kmv import kmv_rollup

        n = 400
        pdf = pd.DataFrame(
            {
                "lang": [f"l{i % 3}" for i in range(n)],
                "source": [f"s{i % 4}" for i in range(n)],
                "content": [f"doc {i % 3} {(i // 3) % (n // 4)}" for i in range(n)],
            }
        )
        df = spark.createDataFrame(pdf)
        k = 16
        got = {
            (r["lang"], r["source"]): (r["n_docs"], r["est_distinct"])
            for r in kmv_rollup(df, ("lang", "source"), k=k).collect()
        }
        hashes = df.select(
            "lang", "source", F.xxhash64("content").alias("h")
        ).toPandas()
        A = "(all)"
        sets = [("lang", "source"), ("lang",), ("source",), ()]
        n_checked = 0
        for keep in sets:
            gb = hashes.groupby(list(keep)) if keep else [((), hashes)]
            for key, grp in gb:
                key = key if isinstance(key, tuple) else (key,)
                full = dict(zip(keep, key))
                rkey = (full.get("lang", A), full.get("source", A))
                mins = kmv_fold(
                    np.empty(0, np.int64),
                    grp["h"].drop_duplicates().to_numpy(np.int64), k
                )
                want = min(int(kmv_estimate(len(mins), int(mins[-1]), k)),
                           len(grp))
                assert got[rkey] == (len(grp), want), rkey
                n_checked += 1
        assert n_checked == len(got)  # every grouping-set row accounted for


class TestStreaming:
    def test_state_folds_across_runs(self, spark, tmp_path):
        """Two AvailableNow runs over a growing directory: the second run
        restores KMV state from the checkpoint and reports distinct counts
        over the WHOLE stream, matching the batch operator on the union."""
        in_dir = str(tmp_path / "incoming")
        os.makedirs(in_dir)
        ckpt = str(tmp_path / "ckpt")

        def arrive(tag, rows):
            pd.DataFrame(rows).to_parquet(
                os.path.join(in_dir, f"{tag}.parquet"), index=False
            )

        def run(name):
            stream = (
                spark.readStream.schema("repo string, content string")
                .parquet(in_dir)
            )
            out = []

            def sink(bdf, _epoch):
                out.extend(bdf.collect())

            q = (
                streaming_distinct_by_key(stream, "repo", "content", k=64)
                .writeStream.foreachBatch(sink)
                .queryName(name)
                .outputMode("update")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)
            # latest row per key wins (update mode re-emits)
            return {r["key"]: r for r in out}

        arrive("a", {"repo": ["r1"] * 6 + ["r2"] * 4,
                     "content": ["x1", "x2", "x3", "x1", "x2", "x1",
                                 "y1", "y2", "y1", "y1"]})
        first = run("kmv_run1")
        assert first["r1"]["n_rows"] == 6 and first["r1"]["est_distinct"] == 3
        assert first["r2"]["n_rows"] == 4 and first["r2"]["est_distinct"] == 2

        # second arrival: overlaps x1/y1, adds new distincts
        arrive("b", {"repo": ["r1"] * 3 + ["r2"] * 2,
                     "content": ["x1", "x4", "x5", "y3", "y1"]})
        second = run("kmv_run2")
        assert second["r1"]["n_rows"] == 9 and second["r1"]["est_distinct"] == 5
        assert second["r2"]["n_rows"] == 6 and second["r2"]["est_distinct"] == 3
        assert second["r1"]["dup_rate"] == pytest.approx(1 - 5 / 9, abs=1e-6)

        # parity with the batch operator over everything that arrived
        batch = {
            r["repo"]: r
            for r in lang_distinct_kmv(
                spark.read.parquet(in_dir), "repo", "content", k=64
            ).collect()
        }
        for key, row in second.items():
            assert batch[key]["n_docs"] == row["n_rows"]
            assert batch[key]["est_distinct"] == row["est_distinct"]


class TestNullGroups:
    """NULL dimension values must survive as '(null)' groups: groupBy keeps
    a null group, but the count⋈sketch equi-join inside both operators
    would silently drop it (SQL null != null) — a real web corpus has docs
    with no detected language and they must not vanish from the audit."""

    def _null_corpus(self, spark):
        pdf = pd.DataFrame(
            {
                "lang": ["py", "py", None, None, "go", None],
                "source": ["s1", None, "s1", None, "s1", "s1"],
                "content": ["a", "a", "b", "c", "d", "b"],
            }
        )
        return spark.createDataFrame(pdf), pdf

    def test_lang_distinct_kmv_keeps_null_group(self, spark):
        df, pdf = self._null_corpus(spark)
        got = {
            r["lang"]: r for r in lang_distinct_kmv(df, "lang", "content").collect()
        }
        assert set(got) == {"py", "go", "(null)"}
        assert got["(null)"]["n_docs"] == 3
        assert got["(null)"]["est_distinct"] == 2  # b, c (b repeated)
        assert got["py"]["n_docs"] == 2 and got["py"]["est_distinct"] == 1

    def test_rollup_keeps_null_leaves_and_unambiguous_all(self, spark):
        from dedup.kmv import kmv_rollup

        df, pdf = self._null_corpus(spark)
        got = {
            (r["lang"], r["source"]): (r["n_docs"], r["est_distinct"])
            for r in kmv_rollup(df, ("lang", "source"), k=64).collect()
        }
        # raw-null leaf survives and is distinct from the rollup marker
        assert got[("(null)", "s1")] == (2, 1)  # b twice
        assert got[("(null)", "(all)")] == (3, 2)
        assert got[("py", "(null)")] == (1, 1)
        # grand total unaffected by null handling
        assert got[("(all)", "(all)")] == (len(pdf), pdf["content"].nunique())
        # every grouping-set row accounted for: no row silently dropped
        langs = {"py", "go", "(null)", "(all)"}
        assert {k[0] for k in got} == langs
