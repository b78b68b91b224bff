"""Regenerate tests/fixtures/sample.bcf (deterministic).

The fixture is written by phlash_tpu.io.bcf.write_bcf; the reader half of
that module is independently validated against an htslib-produced file's
golden counts (see tests/test_bcf.py::test_golden_counts for the numbers
this fixture pins).  Run from the repo root:

    python tools/make_bcf_fixture.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from phlash_tpu.io.bcf import write_bcf

HEADER = "\n".join(
    [
        "##fileformat=VCFv4.2",
        '##FILTER=<ID=PASS,Description="All filters passed">',
        '##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">',
        "##contig=<ID=chr1,length=1000000>",
        "##contig=<ID=chr2,length=500000>",
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tsampleA\tsampleB",
    ]
)


def make_records(chrom: str, n: int, span: int, rng: np.random.Generator):
    pos = np.sort(rng.choice(np.arange(1, span), size=n, replace=False))
    for p in pos:
        gts = []
        for _ in range(2):
            r = rng.random()
            if r < 0.05:
                gts.append((None, None))
            elif r < 0.45:
                gts.append((0, 1))
            elif r < 0.60:
                gts.append((1, 1))
            else:
                gts.append((0, 0))
        yield (chrom, int(p), "A", ["T"], gts)


def main():
    rng = np.random.default_rng(2026)
    out = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures", "sample.bcf")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    records = list(make_records("chr1", 3000, 1_000_000, rng))
    records += list(make_records("chr2", 500, 500_000, rng))
    write_bcf(out, HEADER, records, index=True)
    print(f"wrote {out} ({os.path.getsize(out)} bytes) + .csi")


if __name__ == "__main__":
    main()
