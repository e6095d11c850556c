"""The north rule's literal criterion: the same job at two parallelism
levels in FRESH processes produces byte-identical output."""

import hashlib
import json
import subprocess
import sys
import textwrap


def _run(ncpu: int, corpus: str) -> str:
    code = textwrap.dedent(f"""
        import ray, hashlib, json, sys
        ray.init(address="local", num_cpus={ncpu}, include_dashboard=False,
                 logging_level="ERROR")
        from ray.data import DataContext
        DataContext.get_current().enable_progress_bars = False
        sys.path.insert(0, "/root/repo")
        import ray.data as rd
        from ocr_platform_ray.pipelines.extraction import extraction_pipeline
        ds = rd.read_parquet("{corpus}")
        df = extraction_pipeline(ds).to_pandas()
        h = {{r.url: hashlib.sha256(r.extracted_text.encode()).hexdigest()
             for r in df.itertuples()}}
        digest = hashlib.sha256(
            "".join(v for _, v in sorted(h.items())).encode()).hexdigest()
        print(json.dumps({{"digest": digest, "n": len(h)}}))
        ray.shutdown()
    """)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, check=True, cwd="/tmp"
    ).stdout
    return json.loads(out.strip().splitlines()[-1])


def test_two_process_two_parallelism_byte_identity(tmp_path, ray_session):
    from ocr_platform_ray.corpus import write_pages_parquet

    corpus = str(tmp_path / "pages")
    write_pages_parquet(corpus, 30, urls_per_shard=10)
    a = _run(2, corpus)
    b = _run(6, corpus)
    assert a["n"] == b["n"] == 30
    assert a["digest"] == b["digest"]
