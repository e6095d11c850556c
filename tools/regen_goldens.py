"""Regenerate the committed extraction goldens after an INTENTIONAL
byte-level change to the extraction semantics (see CLAUDE.md invariants —
never run this to make a red test green without understanding the diff).

Usage: python tools/regen_goldens.py
"""

import hashlib
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
GOLDEN = os.path.join(REPO, "tests", "goldens", "docs_sha.json")


def main() -> None:
    import ray

    ray.init(address="local", num_cpus=4, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import ray.data as rd

    from ocr_platform_ray.corpus import make_pages_table
    from ocr_platform_ray.pipelines.extraction import extraction_pipeline

    with open(GOLDEN) as f:
        old = json.load(f)
    df = extraction_pipeline(rd.from_arrow(make_pages_table(60))).to_pandas()
    new = {
        r.url: {
            "sha256": hashlib.sha256(r.extracted_text.encode()).hexdigest(),
            "n_pages": int(r.n_pages),
            "total_words": int(r.total_words),
            "n_failed_pages": int(r.n_failed_pages),
        }
        for r in df.itertuples()
    }
    changed = [u for u in new if new[u] != old.get(u)]
    with open(GOLDEN, "w") as f:
        json.dump(new, f, indent=1, sort_keys=True)
    print(f"regenerated {len(new)} urls; {len(changed)} changed: {changed[:10]}")

    # curate-chain golden (same corpus through the full curation chain)
    from ocr_platform_ray.pipelines.curate import curate_corpus

    curate_golden = os.path.join(REPO, "tests", "goldens", "curate_sha.json")
    cdf = curate_corpus(rd.from_arrow(make_pages_table(60)), min_tokens=5).to_pandas()
    cnew = {
        r.url: {
            "split": r.split,
            "n_dups": int(r.n_dups),
            "pred_lang": r.pred_lang,
            "sha256": hashlib.sha256(r.extracted_text.encode()).hexdigest(),
        }
        for r in cdf.itertuples()
    }
    with open(curate_golden, "w") as f:
        json.dump(cnew, f, indent=1, sort_keys=True)
    print(f"regenerated curate golden: {len(cnew)} urls")
    ray.shutdown()


if __name__ == "__main__":
    main()
