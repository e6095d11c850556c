"""Round-4 operator tests: scale-safe representative filtering
(clusters="auto" / Dataset-native labels + bucketed anti-join losers),
the as_dataset minhash pair route, list-column freeze/thaw for the
pandas exchanges, and the fully-distributed curation chain."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd


def _sorted(df: pd.DataFrame, by) -> pd.DataFrame:
    return df.sort_values(by).reset_index(drop=True)


@pytest.fixture()
def giant_cluster_docs():
    """60% of the corpus is ONE near-dup cluster (a template with tiny
    per-doc noise) — the worst case for driver-side cluster resolution:
    pair list ~ O(cluster^2 / bands), loser set ~ corpus-sized."""
    rng = np.random.RandomState(11)
    base = "the quick brown fox jumps over the lazy dog and runs far away tonight " * 3
    texts, ids = [], []
    for i in range(50):
        if i < 30:  # the giant cluster: one word appended varies
            texts.append(base + f"tail{i % 3}")
        else:  # singletons
            words = [f"w{rng.randint(1000)}" for _ in range(30)]
            texts.append(" ".join(words))
        ids.append(i)
    return pd.DataFrame({"doc_id": ids, "text": texts})


@pytest.mark.usefixtures("ray_session")
class TestKeepRepresentativesAuto:
    def test_auto_matches_driver_both_sides_of_threshold(self, giant_cluster_docs):
        from ocr_platform_ray.ops.dedup import (
            dedup_keep_representatives,
            minhash_lsh_duplicates,
        )

        ds = rd.from_pandas(giant_cluster_docs)
        pairs = minhash_lsh_duplicates(ds, "text", "doc_id", threshold=0.7)
        assert len(pairs) > 10  # the giant cluster produced a real pair list
        want = _sorted(
            dedup_keep_representatives(ds, pairs, "doc_id").to_pandas(), "doc_id"
        )
        # auto below threshold -> driver route (probe IS the pair table)
        got_small = _sorted(
            dedup_keep_representatives(
                ds, rd.from_pandas(pairs), "doc_id", clusters="auto"
            ).to_pandas(),
            "doc_id",
        )
        pd.testing.assert_frame_equal(got_small, want)
        # auto past threshold -> distributed labels + bucketed anti-join
        got_big = _sorted(
            dedup_keep_representatives(
                ds,
                rd.from_pandas(pairs),
                "doc_id",
                clusters="auto",
                driver_threshold_rows=3,
            ).to_pandas(),
            "doc_id",
        )
        pd.testing.assert_frame_equal(got_big, want)

    def test_distributed_route_string_ids(self):
        from ocr_platform_ray.ops.dedup import dedup_keep_representatives

        docs = pd.DataFrame({"url": [f"u{i:03d}" for i in range(20)], "v": range(20)})
        pairs = pd.DataFrame(
            {"id_a": ["u001", "u005", "u010"], "id_b": ["u002", "u006", "u011"]}
        )
        want = _sorted(
            dedup_keep_representatives(rd.from_pandas(docs), pairs, "url").to_pandas(),
            "url",
        )
        got = _sorted(
            dedup_keep_representatives(
                rd.from_pandas(docs), rd.from_pandas(pairs), "url", clusters="distributed"
            ).to_pandas(),
            "url",
        )
        pd.testing.assert_frame_equal(got, want)

    def test_auto_empty_pairs_dataset_is_identity(self):
        from ocr_platform_ray.ops.dedup import dedup_keep_representatives

        docs = pd.DataFrame({"doc_id": range(10), "x": range(10)})
        empty = rd.from_pandas(
            pd.DataFrame({"id_a": pd.Series(dtype="int64"), "id_b": pd.Series(dtype="int64")})
        )
        kept = dedup_keep_representatives(
            rd.from_pandas(docs), empty, "doc_id", clusters="auto"
        )
        assert kept.count() == 10

    def test_labels_as_dataset_matches_pandas_route(self):
        from ocr_platform_ray.ops.dedup import dup_clusters_distributed

        pairs = pd.DataFrame(
            {"id_a": [1, 2, 10, 11, 20], "id_b": [2, 3, 11, 12, 21]}
        )
        want = dup_clusters_distributed(rd.from_pandas(pairs))
        got_ds = dup_clusters_distributed(rd.from_pandas(pairs), as_dataset=True)
        assert isinstance(got_ds, rd.Dataset)
        got = (
            got_ds.to_pandas()
            .astype({"id": "int64", "cluster_id": "int64"})
            .sort_values("id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want)


@pytest.mark.usefixtures("ray_session")
class TestMinhashAsDataset:
    def test_pairs_match_pandas_route(self, giant_cluster_docs):
        from ocr_platform_ray.ops.dedup import minhash_lsh_duplicates

        ds = rd.from_pandas(giant_cluster_docs)
        want = minhash_lsh_duplicates(ds, "text", "doc_id", threshold=0.7, verify="bucketed")
        got_ds = minhash_lsh_duplicates(ds, "text", "doc_id", threshold=0.7, as_dataset=True)
        assert isinstance(got_ds, rd.Dataset)
        got = (
            got_ds.to_pandas()
            .astype({"id_a": "int64", "id_b": "int64"})
            .sort_values(["id_a", "id_b"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want)


@pytest.mark.usefixtures("ray_session")
class TestFreezeThaw:
    def test_roundtrip_ragged_lists(self):
        from ocr_platform_ray.ops.relational import (
            freeze_list_columns,
            thaw_list_columns,
        )

        df = pd.DataFrame(
            {
                "id": [1, 2, 3],
                "offs": [
                    np.array([0, 5], dtype=np.int64),
                    np.array([0], dtype=np.int64),
                    np.array([0, 2, 9], dtype=np.int64),
                ],
            }
        )
        ds = rd.from_pandas(df)
        frozen, spec = freeze_list_columns(ds)
        assert list(spec) == ["offs"] and spec["offs"] == np.dtype("int64")
        out = thaw_list_columns(frozen, spec).to_pandas().sort_values("id")
        for a, b in zip(df["offs"], out["offs"]):
            assert np.array_equal(a, np.asarray(b))
            assert np.asarray(b).dtype == np.dtype("int64")

    def test_noop_without_list_columns(self):
        from ocr_platform_ray.ops.relational import freeze_list_columns

        ds = rd.from_pandas(pd.DataFrame({"id": [1, 2], "s": ["a", "b"]}))
        same, spec = freeze_list_columns(ds)
        assert spec == {} and same is ds


@pytest.mark.usefixtures("ray_session")
class TestRankBucketsSketch:
    @staticmethod
    def _skewed_df():
        rng = np.random.RandomState(7)
        n_big, n_small = 9000, 60
        # distinct scores (boundary ties are the documented sketch gap)
        scores = rng.permutation(np.arange(n_big + n_small, dtype=np.float64) * 0.25 + 1.0)
        return pd.DataFrame(
            {
                "lang": ["en"] * n_big + ["fr"] * n_small,
                "score": scores,
                "doc_id": np.arange(n_big + n_small, dtype=np.int64),
            }
        )

    def _run(self, df, **kw):
        from ocr_platform_ray.ops.relational import grouped_rank_buckets

        out = grouped_rank_buckets(
            rd.from_pandas(df).repartition(8),
            ["lang"],
            ["score", "doc_id"],
            n_buckets=3,
            labels=["head", "middle", "tail"],
            **kw,
        )
        return _sorted(out.to_pandas(), "doc_id")

    def test_sketch_route_matches_exact_away_from_boundaries(self):
        df = self._skewed_df()
        exact = self._run(df)
        sk = self._run(df, method="sketch", sketch_k=512)
        m = exact.merge(sk, on="doc_id", suffixes=("_e", "_s"))
        agree = (m["bucket_e"] == m["bucket_s"]).mean()
        # skewed group (9000 rows, k=512): boundary rank error O(n/k)
        # per cutoff -> expect ~99.5% agreement, never global error
        assert agree >= 0.98, agree
        # the small group (n=60 <= k) is EXACT: the sketch keeps every
        # value as its own anchor
        fr = m[m["lang_e"] == "fr"]
        assert (fr["bucket_e"] == fr["bucket_s"]).all()
        # per-group bucket proportions stay ~1/3 on the sketch route
        en = sk[sk["lang"] == "en"]["bucket"].value_counts(normalize=True)
        assert abs(en["head"] - 1 / 3) < 0.02

    def test_auto_probe_picks_route_by_group_size(self):
        df = self._skewed_df()
        via_auto_small = self._run(df, method="auto", group_row_threshold=100)
        via_sketch = self._run(df, method="sketch")
        pd.testing.assert_frame_equal(via_auto_small, via_sketch)
        via_auto_big = self._run(df, method="auto", group_row_threshold=10**7)
        via_exact = self._run(df)
        pd.testing.assert_frame_equal(via_auto_big, via_exact)


@pytest.mark.usefixtures("ray_session")
class TestCurateScaleRoutes:
    def test_scale_routes_byte_identical_to_default(self):
        """Driver-free chain (bucketed winners, Dataset pairs, label
        propagation + anti-join losers) == the probing default, including
        the ragged lineage columns through freeze/thaw."""
        from ocr_platform_ray.corpus import make_pages_table
        from ocr_platform_ray.pipelines.curate import curate_corpus

        a = _sorted(
            curate_corpus(rd.from_arrow(make_pages_table(60)), min_tokens=5).to_pandas(),
            "url",
        )
        b = _sorted(
            curate_corpus(
                rd.from_arrow(make_pages_table(60)), min_tokens=5, scale_routes=True
            ).to_pandas(),
            "url",
        )
        assert set(a.columns) == set(b.columns)
        b = b[list(a.columns)]
        assert len(a) == len(b) and len(a) > 0
        for c in a.columns:
            for x, y in zip(a[c].tolist(), b[c].tolist()):
                if isinstance(x, np.ndarray) or isinstance(y, np.ndarray):
                    assert np.array_equal(np.asarray(x), np.asarray(y)), c
                else:
                    assert x == y, c
