"""Round-4 session-5 operator tests: snapshot diff / CDC, link graph
extraction, text normalization."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd


@pytest.mark.usefixtures("ray_session")
class TestSnapshotDiff:
    def _frames(self):
        old = pd.DataFrame(
            {
                "k": np.arange(0, 100, dtype="int64"),
                "text": [f"doc {i}" for i in range(100)],
                "extra": np.arange(100) * 2,
            }
        )
        new = old[old.k % 9 != 4].copy()  # %9==4 removed
        new.loc[new.k % 5 == 0, "text"] = "rewritten"  # changed
        add = pd.DataFrame(
            {"k": [200, 201], "text": ["brand new", "also new"], "extra": [0, 0]}
        )
        new = pd.concat([new, add], ignore_index=True)
        return old, new

    def _want(self, old, new):
        m = old.merge(new, on="k", how="outer", suffixes=("_o", "_n"), indicator=True)
        status = np.where(
            m["_merge"] == "right_only",
            "added",
            np.where(
                m["_merge"] == "left_only",
                "removed",
                np.where(m["text_o"] == m["text_n"], "unchanged", "changed"),
            ),
        )
        return pd.DataFrame({"k": m["k"], "change": status})

    def test_matches_pandas_truth(self):
        from ocr_platform_ray.ops.diff import snapshot_diff

        old, new = self._frames()
        got = (
            snapshot_diff(rd.from_pandas(old), rd.from_pandas(new), "k", ["text"])
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
        want = self._want(old, new)
        want = (
            want[want.change != "unchanged"].sort_values("k").reset_index(drop=True)
        )
        assert got["k"].astype("int64").tolist() == want["k"].astype("int64").tolist()
        assert got["change"].tolist() == want["change"].tolist()
        assert set(got["change"]) == {"added", "removed", "changed"}

    def test_include_unchanged_and_block_independence(self):
        from ocr_platform_ray.ops.diff import snapshot_diff

        old, new = self._frames()
        outs = []
        for nb in (1, 7):
            got = (
                snapshot_diff(
                    rd.from_pandas(old).repartition(nb),
                    rd.from_pandas(new).repartition(max(1, 11 - nb)),
                    "k",
                    ["text"],
                    include_unchanged=True,
                )
                .to_pandas()
                .sort_values("k")
                .reset_index(drop=True)
            )
            outs.append(got)
        pd.testing.assert_frame_equal(outs[0], outs[1])
        want = self._want(old, new).sort_values("k").reset_index(drop=True)
        assert outs[0]["change"].tolist() == want["change"].tolist()

    def test_multi_column_identity(self):
        from ocr_platform_ray.ops.diff import snapshot_diff

        old, new = self._frames()
        # extra participates: rows whose text is unchanged but extra differs
        new2 = new.copy()
        touched = (new2.k % 5 != 0) & (new2.k < 100) & (new2.k % 3 == 1)
        new2.loc[touched, "extra"] = -1
        got = (
            snapshot_diff(
                rd.from_pandas(old), rd.from_pandas(new2), "k", ["text", "extra"]
            )
            .to_pandas()
        )
        changed = set(got[got.change == "changed"]["k"].astype(int))
        assert set(new2[touched]["k"].astype(int)) <= changed

    def test_string_keys(self):
        from ocr_platform_ray.ops.diff import snapshot_diff

        old = pd.DataFrame({"u": ["a", "b", "c"], "v": ["1", "2", "3"]})
        new = pd.DataFrame({"u": ["b", "c", "d"], "v": ["2", "x", "4"]})
        got = (
            snapshot_diff(rd.from_pandas(old), rd.from_pandas(new), "u", ["v"])
            .to_pandas()
            .sort_values("u")
            .reset_index(drop=True)
        )
        assert dict(zip(got["u"], got["change"])) == {
            "a": "removed",
            "c": "changed",
            "d": "added",
        }

    def test_duplicate_key_raises(self):
        from ocr_platform_ray.ops.diff import snapshot_diff

        old = pd.DataFrame({"k": [1, 1], "v": ["a", "b"]})
        new = pd.DataFrame({"k": [1], "v": ["a"]})
        with pytest.raises(Exception, match="duplicate|unique"):
            snapshot_diff(
                rd.from_pandas(old), rd.from_pandas(new), "k", ["v"]
            ).to_pandas()

    def test_diff_summary(self):
        from ocr_platform_ray.ops.diff import diff_summary, snapshot_diff

        old, new = self._frames()
        d = snapshot_diff(rd.from_pandas(old), rd.from_pandas(new), "k", ["text"])
        s = diff_summary(d)
        want = self._want(old, new)
        counts = want[want.change != "unchanged"]["change"].value_counts()
        assert dict(zip(s["change"], s["n"])) == counts.to_dict()
