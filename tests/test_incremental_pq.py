"""Incremental IVF-PQ index maintenance (round-4 verdict item #5):
`index_new_partitions_pq` = the fingerprint-skip machinery of
`index_new_partitions` composed with `build_ivf_pq_index`'s PQ-coded
cell subtrees, frozen centroids AND codebooks.  Mirrors
TestIncrementalIvfIndex: skip / append / redo / search parity vs a full
rebuild."""

import glob

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from ocr_platform_ray.ops.similarity import (
    build_ivf_pq_index,
    index_new_partitions_pq,
    knn_ivf_pq,
)


@pytest.mark.usefixtures("ray_session")
class TestIncrementalIvfPq:
    @staticmethod
    def _shard(tmp_path, name, ids, rng, dim=16):
        vecs = rng.randn(len(ids), dim)
        vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
        t = pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "embedding": pa.array(
                    [v.tolist() for v in vecs], pa.list_(pa.float64())
                ),
            }
        )
        pq.write_table(t, str(tmp_path / "src" / f"{name}.parquet"))
        return vecs

    def test_skip_append_redo_and_full_rebuild_parity(self, tmp_path):
        rng = np.random.RandomState(17)
        (tmp_path / "src").mkdir()
        src, idx = str(tmp_path / "src"), str(tmp_path / "idx")
        self._shard(tmp_path, "a", range(0, 100), rng)
        self._shard(tmp_path, "b", range(100, 200), rng)

        r1 = index_new_partitions_pq(src, idx, n_cells=4, m=4, n_codes=16)
        assert r1["indexed"] == 2 and r1["rows_indexed"] == 200
        # second call: nothing new -> all skipped, models untouched
        cent1 = np.load(str(tmp_path / "idx" / "centroids.npy"))
        books1 = np.load(str(tmp_path / "idx" / "codebooks.npy"))
        r2 = index_new_partitions_pq(src, idx, n_cells=4, m=4, n_codes=16)
        assert r2["indexed"] == 0 and r2["skipped"] == 2
        # append a shard -> only it encodes; frozen models unchanged
        self._shard(tmp_path, "c", range(200, 260), rng)
        r3 = index_new_partitions_pq(src, idx, n_cells=4, m=4, n_codes=16)
        assert r3["indexed"] == 1 and r3["rows_indexed"] == 60
        assert np.array_equal(cent1, np.load(str(tmp_path / "idx" / "centroids.npy")))
        assert np.array_equal(books1, np.load(str(tmp_path / "idx" / "codebooks.npy")))
        # redo shard a (different content/size) -> exactly it re-encodes,
        # replaced not merged
        self._shard(tmp_path, "a", range(0, 90), rng)
        r4 = index_new_partitions_pq(src, idx, n_cells=4, m=4, n_codes=16)
        assert r4["indexed"] == 1 and r4["rows_indexed"] == 90
        total = sum(
            pq.ParquetFile(f).metadata.num_rows
            for f in glob.glob(
                str(tmp_path / "idx" / "parts" / "**" / "*.parquet"), recursive=True
            )
        )
        assert total == 90 + 100 + 60
        # raw vectors are not stored in the index
        one = glob.glob(
            str(tmp_path / "idx" / "parts" / "**" / "*.parquet"), recursive=True
        )[0]
        assert "embedding" not in pq.ParquetFile(one).schema_arrow.names

        # search parity: a FULL rebuild under the SAME frozen models must
        # return identical results at every n_probe (codes are a pure
        # function of (vector, models))
        full = str(tmp_path / "full")
        build_ivf_pq_index(
            rd.read_parquet(src),
            full,
            n_cells=4,
            m=4,
            n_codes=16,
            centroids=cent1,
            codebooks=books1,
        )
        q = rng.randn(3, 16)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        for n_probe in (1, 2, 4):
            got = knn_ivf_pq(idx, q, k=5, n_probe=n_probe)
            want = knn_ivf_pq(full, q, k=5, n_probe=n_probe)
            pd.testing.assert_frame_equal(
                got.reset_index(drop=True), want.reset_index(drop=True)
            )
        # and parity is non-vacuous
        assert len(knn_ivf_pq(idx, q, k=5, n_probe=4)) == 15
