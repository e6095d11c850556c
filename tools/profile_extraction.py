"""Print the flagship pipeline's per-stage Ray Data stats (the
measure-don't-guess loop: wall/UDF time, block counts, throughput per
operator).

Usage: python tools/profile_extraction.py [n_urls] [--shuffle]
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    n_urls = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 6000
    partitioned = "--shuffle" not in sys.argv

    import ray

    ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from ocr_platform_ray.corpus import write_pages_parquet
    from ocr_platform_ray.pipelines.extraction import extraction_pipeline, read_pages

    corpus_dir = f"/tmp/ocr_profile_corpus_{n_urls}"
    if not os.path.isdir(corpus_dir) or not os.listdir(corpus_dir):
        write_pages_parquet(corpus_dir, n_urls, urls_per_shard=250)
    n_files = len(os.listdir(corpus_dir))

    def run():
        docs = extraction_pipeline(
            read_pages(corpus_dir, parallelism=n_files), partitioned_input=partitioned
        )
        n = sum(b.num_rows for b in docs.iter_batches(batch_format="pyarrow"))
        return docs, n

    run()  # warm
    t0 = time.monotonic()
    docs, n = run()
    wall = time.monotonic() - t0
    print(f"# {n} docs, wall {wall:.2f}s, path={'partitioned' if partitioned else 'shuffle'}")
    print(docs.stats())
    ray.shutdown()


if __name__ == "__main__":
    main()
