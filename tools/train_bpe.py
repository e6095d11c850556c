"""Regenerate the committed BPE merge table
(ocr_platform_ray/data/bpe_merges.txt) from the deterministic sf0.001
documents corpus.  Run consciously — tests pin encodings against the
committed table.

    python tools/train_bpe.py [sf_dir] [n_merges]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow.parquet as pq

from ocr_platform_ray.functions.bpe import save_merges, train_bpe

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
n_merges = int(sys.argv[2]) if len(sys.argv) > 2 else 500

texts = pq.read_table(f"{sf_dir}/documents.parquet", columns=["text"]).column("text").to_pylist()
merges = train_bpe(texts, n_merges=n_merges)
out = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "ocr_platform_ray",
    "data",
    "bpe_merges.txt",
)
os.makedirs(os.path.dirname(out), exist_ok=True)
save_merges(merges, out)
print(f"wrote {len(merges)} merges -> {out}")
