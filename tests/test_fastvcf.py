"""C VCF tokenizer: build, parse, and parity with the pure-Python parser."""

import gzip

import numpy as np
import pytest

from phlash_tpu.io import parse_vcf_lines, vcf_parser_backend

VCF = b"""##fileformat=VCFv4.2
##contig=<ID=chr1,length=1000>
#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tsA\tsB\tsC
chr1\t10\t.\tA\tT\t.\tPASS\t.\tGT:DP\t0/1:3\t0/0:9\t1/1:2
chr2\t11\t.\tA\tT\t.\tPASS\t.\tGT\t1/1\t0/1\t0/0
chr1\t150\t.\tG\tC\t.\tPASS\t.\tGT\t.|1\t0|1\t./.
chr1\t400\t.\tT\tA\t.\tPASS\t.\tGT\t0/0\t1/1\t0/1
"""


needs_c = pytest.mark.skipif(
    vcf_parser_backend() != "c", reason="C extension could not be built"
)


@needs_c
def test_parse_basic():
    pos, het, nd = parse_vcf_lines(VCF, [9, 10, 11], contig="chr1")
    np.testing.assert_array_equal(pos, [10, 150, 400])
    np.testing.assert_array_equal(het[0], [1, 0, 0])  # 0/1, 0/0, 1/1
    np.testing.assert_array_equal(het[1], [-1, 1, -1])  # .|1, 0|1, ./.
    np.testing.assert_array_equal(het[2], [0, 0, 1])  # 0/0, 1/1, 0/1
    np.testing.assert_array_equal(het[:, 2], [0, -1, 1])  # sample sC across records
    # nd counts non-reference alleles (missing alleles don't count)
    np.testing.assert_array_equal(nd, [3, 2, 3])


@needs_c
def test_contig_filter():
    pos, _, _ = parse_vcf_lines(VCF, [9], contig="chr2")
    np.testing.assert_array_equal(pos, [11])
    # no filter: all records
    pos, _, _ = parse_vcf_lines(VCF, [9], contig=None)
    assert len(pos) == 4


@needs_c
def test_fast_path_matches_python(tmp_path, rng):
    "VcfContig must produce identical output via C and pure-Python parsers."
    from phlash_tpu import data as data_mod
    from phlash_tpu.data import VcfContig

    # synthesize a larger VCF
    lines = [
        "##fileformat=VCFv4.2",
        "##contig=<ID=chr9,length=100000>",
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\ts1\ts2",
    ]
    gts = ["0/0", "0/1", "1/1", "./.", "0|1", "1|0"]
    positions = np.sort(rng.choice(np.arange(100, 99000), size=500, replace=False))
    for p in positions:
        lines.append(
            f"chr9\t{p}\t.\tA\tG\t.\tPASS\t.\tGT\t{rng.choice(gts)}\t{rng.choice(gts)}"
        )
    path = tmp_path / "big.vcf.gz"
    with gzip.open(path, "wt") as f:
        f.write("\n".join(lines) + "\n")

    c = VcfContig(str(path), samples=["s1", "s2"], contig="chr9", interval=(1, 99000))
    fast = c._get_data_fast(100)
    assert fast is not None
    # force the slow path
    slow_records = c.get_data.__wrapped__ if hasattr(c.get_data, "__wrapped__") else None
    import unittest.mock as mock

    with mock.patch.object(VcfContig, "_get_data_fast", return_value=None):
        slow = c.get_data(100)
    np.testing.assert_array_equal(fast["het_matrix"], slow["het_matrix"])
    np.testing.assert_array_equal(fast["afs"], slow["afs"])


@needs_c
def test_unsorted_vcf_full_scan_is_complete(tmp_path):
    """Unindexed files are always scanned in full, so record order is
    irrelevant: early-stopping is reserved for tabix-indexed queries (a
    .tbi proves coordinate-sortedness).  An unsorted file must therefore
    produce the identical region answer to its sorted equivalent — even
    when the disorder spans what an early-stop would have skipped."""
    from phlash_tpu.data import VcfContig

    header = [
        "##fileformat=VCFv4.2",
        "##contig=<ID=chr3,length=10000>",
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\ts1",
    ]
    # a record *after* the interval appears first; a sorted-assuming scan
    # would early-stop right there and drop everything that follows
    rows = [
        "chr3\t9000\t.\tA\tT\t.\tPASS\t.\tGT\t0/1",
        "chr3\t100\t.\tA\tT\t.\tPASS\t.\tGT\t0/1",
        "chr3\t200\t.\tA\tT\t.\tPASS\t.\tGT\t1/1",
        "chr3\t300\t.\tA\tT\t.\tPASS\t.\tGT\t0/1",
    ]
    path = tmp_path / "unsorted.vcf"
    path.write_text("\n".join(header + rows) + "\n")
    c = VcfContig(str(path), samples=["s1"], contig="chr3", interval=(1, 500))
    d = c.get_data(100)
    # records at 100, 200, 300 -> windows 0, 1, 2; het at 100 and 300
    np.testing.assert_array_equal(d["het_matrix"][0][:4], [1, 0, 1, 0])
    np.testing.assert_array_equal(d["afs"], [2])

    # the sorted equivalent produces the identical region answer
    path2 = tmp_path / "sorted.vcf"
    path2.write_text("\n".join(header + sorted(rows, key=lambda r: int(r.split("\t")[1]))) + "\n")
    c2 = VcfContig(str(path2), samples=["s1"], contig="chr3", interval=(1, 500))
    d2 = c2.get_data(100)
    np.testing.assert_array_equal(d["het_matrix"], d2["het_matrix"])
    np.testing.assert_array_equal(d["afs"], d2["afs"])


@needs_c
def test_indexed_but_unsorted_vcf_warns_and_rescans(tmp_path, caplog, monkeypatch):
    """Safety net: an index that claims sortedness over a file that is not
    (index/data mismatch) must trigger the in-scan disorder detection,
    warn, and rescan in full instead of silently dropping records."""
    import gzip as _gzip
    import logging

    from phlash_tpu import data as data_mod
    from phlash_tpu.data import VcfContig

    header = [
        "##fileformat=VCFv4.2",
        "##contig=<ID=chr3,length=10000>",
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\ts1",
    ]
    rows = [
        "chr3\t9000\t.\tA\tT\t.\tPASS\t.\tGT\t0/1",
        "chr3\t100\t.\tA\tT\t.\tPASS\t.\tGT\t0/1",
        "chr3\t300\t.\tA\tT\t.\tPASS\t.\tGT\t0/1",
    ]
    path = tmp_path / "mismatch.vcf.gz"
    with _gzip.open(path, "wt") as f:
        f.write("\n".join(header + rows) + "\n")
    (tmp_path / "mismatch.vcf.gz.tbi").write_bytes(b"")  # existence check only

    import phlash_tpu.io.tabix as tabix_mod

    monkeypatch.setattr(tabix_mod, "region_start_voff", lambda *a, **k: 0)
    c = VcfContig(str(path), samples=["s1"], contig="chr3", interval=(1, 500))
    with caplog.at_level(logging.WARNING):
        d = c.get_data(100)
    assert "not coordinate-sorted" in caplog.text
    np.testing.assert_array_equal(d["het_matrix"][0][:4], [1, 0, 1, 0])
    np.testing.assert_array_equal(d["afs"], [2])
