"""Native BCF2.2 reader/writer (no pysam required).

The reference can only open .bcf files through pysam
(/root/reference/src/phlash/data.py:277-308).  This module implements the
BCF2.2 binary container directly from the htslib spec so the framework
ingests .bcf anywhere Python runs:

- BGZF: each block is a standard gzip member carrying a BC extra field, so
  the stdlib ``gzip`` module decompresses a whole file transparently; the
  writer emits spec-conformant 64 KiB blocks plus the 28-byte EOF sentinel.
- Records are scanned sequentially with an early stop once a (sorted) file
  moves past the requested region; only the 8 bytes of CHROM/POS plus the
  genotype block are decoded for in-region records, everything else is
  skipped.  (pysam, when installed, is still preferred upstream because
  a .csi index makes region fetches O(region) instead of O(file).)

The reader yields the same ``{'pos', 'het', 'nd'}`` records as the text-VCF
parser in phlash_tpu.data; the writer exists to generate golden fixtures and
round-trip tests without bcftools.
"""

from __future__ import annotations

import gzip
import struct
import zlib
from typing import Iterator

import numpy as np

_MAGIC = b"BCF\x02\x02"

# typed-descriptor atom widths: int8, int16, int32, float32, char
_TYPE_SIZE = {1: 1, 2: 2, 3: 4, 5: 4, 7: 1}
_TYPE_NP = {1: np.int8, 2: np.int16, 3: np.int32, 5: np.float32, 7: np.uint8}
# per-width sentinel for "end of vector" (mixed-ploidy padding)
_EOV = {1: -127, 2: -32767, 3: -2147483647}


# ---------------------------------------------------------------------------
# header dictionaries
# ---------------------------------------------------------------------------


def _header_dicts(text: str):
    """Build the contig and string (FILTER/INFO/FORMAT id) dictionaries.

    Entries are indexed by an explicit IDX= field when present, otherwise in
    order of first appearance; "PASS" implicitly occupies string index 0.
    Returns (contigs, strings, samples).
    """

    def field(line: str, key: str) -> str | None:
        at = line.find(key + "=")
        if at < 0:
            return None
        val = line[at + len(key) + 1 :]
        if val.startswith('"'):
            return val[1 : val.index('"', 1)]
        for stop in (",", ">"):
            if stop in val:
                val = val[: val.index(stop)]
        return val

    contigs: dict[int, str] = {}
    strings: dict[int, str] = {0: "PASS"}
    seen = {"PASS"}
    samples: list[str] = []
    for line in text.splitlines():
        if line.startswith("##contig"):
            name = field(line, "ID")
            idx = field(line, "IDX")
            contigs[int(idx) if idx else len(contigs)] = name
        elif any(line.startswith("##" + k) for k in ("FILTER", "INFO", "FORMAT")):
            name = field(line, "ID")
            if name in seen:
                continue
            seen.add(name)
            idx = field(line, "IDX")
            strings[int(idx) if idx else len(strings)] = name
        elif line.startswith("#CHROM"):
            cols = line.rstrip("\n").split("\t")
            samples = cols[9:]
    return contigs, strings, samples


# ---------------------------------------------------------------------------
# typed values
# ---------------------------------------------------------------------------


def _read_typed_meta(buf: memoryview, at: int) -> tuple[int, int, int]:
    "Decode a type descriptor; returns (atom_type, count, next_offset)."
    desc = buf[at]
    at += 1
    atom, count = desc & 0x0F, desc >> 4
    if count == 15:  # actual count follows as a typed scalar int
        count, at = _read_typed_int(buf, at)
    return atom, count, at


def _read_typed_int(buf: memoryview, at: int) -> tuple[int, int]:
    desc = buf[at]
    atom = desc & 0x0F
    at += 1
    if atom == 1:
        return struct.unpack_from("<b", buf, at)[0], at + 1
    if atom == 2:
        return struct.unpack_from("<h", buf, at)[0], at + 2
    if atom == 3:
        return struct.unpack_from("<i", buf, at)[0], at + 4
    raise ValueError(f"typed int with atom type {atom}")


def _skip_typed(buf: memoryview, at: int) -> int:
    atom, count, at = _read_typed_meta(buf, at)
    return at + count * (_TYPE_SIZE[atom] if count else 0)


# ---------------------------------------------------------------------------
# reading
# ---------------------------------------------------------------------------


class BcfFile:
    """Sequential BCF2.2 reader exposing header metadata and GT decoding."""

    def __init__(self, path: str):
        self.path = path
        self._fh = gzip.open(path, "rb")
        if self._fh.read(5) != _MAGIC:
            raise ValueError(f"{path}: not a BCF2 file")
        (l_text,) = struct.unpack("<I", self._fh.read(4))
        self.header_text = self._fh.read(l_text).rstrip(b"\x00").decode()
        self.contigs, self.strings, self.samples = _header_dicts(self.header_text)
        self._gt_keys = {i for i, s in self.strings.items() if s == "GT"}

    def close(self):
        self._fh.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def records(self, contig: str, start: int, end: int) -> Iterator[tuple[int, np.ndarray]]:
        """Yield (1-based position, genotype matrix) for records in a region.

        The genotype matrix is int16 (n_samples, ploidy) of allele indices,
        -1 where the call is missing, -2 past a sample's ploidy.  Assumes the
        file is coordinate-sorted (as required by the spec) and stops early
        once the region has been passed.
        """
        want = {i for i, name in self.contigs.items() if name == contig}
        if not want:
            raise ValueError(f"contig {contig!r} not in {self.path}")
        in_contig = False
        while True:
            head = self._fh.read(8)
            if len(head) < 8:
                return
            l_shared, l_indiv = struct.unpack("<II", head)
            shared = self._fh.read(l_shared)
            rid, pos0 = struct.unpack_from("<ii", shared, 0)
            if rid not in want:
                self._fh.read(l_indiv)
                if in_contig:  # sorted file: our contig's section is over
                    return
                continue
            in_contig = True
            pos = pos0 + 1
            if pos > end:
                return
            if pos < start:
                self._fh.read(l_indiv)
                continue
            n_fmt = struct.unpack_from("<I", shared, 20)[0] >> 24
            gt = self._decode_gt(memoryview(self._fh.read(l_indiv)), n_fmt)
            if gt is not None:
                yield pos, gt

    def _decode_gt(self, indiv: memoryview, n_fmt: int) -> np.ndarray | None:
        "Walk the per-sample blocks until the GT key; decode allele indices."
        n_sample = len(self.samples)
        at = 0
        for _ in range(n_fmt):
            key, at = _read_typed_int(indiv, at)
            atom, ploidy, at = _read_typed_meta(indiv, at)
            width = _TYPE_SIZE[atom] * ploidy
            if key not in self._gt_keys:
                at += width * n_sample
                continue
            raw = np.frombuffer(indiv, _TYPE_NP[atom], n_sample * ploidy, at)
            enc = raw.reshape(n_sample, ploidy).astype(np.int64)
            allele = (enc >> 1) - 1  # 0 encodes '.', k+1 encodes allele k
            allele[enc == 0] = -1
            allele[enc == _EOV[atom]] = -2
            return allele.astype(np.int16)
        return None


def iter_bcf(path: str, contig: str, start: int, end: int, samples: list[str]):
    """Yield {'pos', 'het' int8 (S,), 'nd'} records from a region of a .bcf.

    Same contract as the text/pysam iterators in phlash_tpu.data: het is 1
    when a diploid call's alleles differ, -1 when either is missing, and nd
    counts non-reference alleles across the requested samples.
    """
    with BcfFile(path) as bcf:
        missing = set(samples) - set(bcf.samples)
        if missing:
            raise ValueError(f"samples not found in the vcf: {missing}")
        cols = np.array([bcf.samples.index(s) for s in samples])
        for pos, gt in bcf.records(contig, start, end):
            sub = gt[cols]
            pair = sub[:, :2] if sub.shape[1] >= 2 else None
            if pair is None:
                het = np.full(len(samples), -1, dtype=np.int8)
            else:
                # not diploid (extra non-padding entries / truncated pair) or
                # missing an allele -> het unknown
                bad = (pair < 0).any(1) | (sub[:, 2:] != -2).any(1)
                het = np.where(bad, -1, pair[:, 0] != pair[:, 1]).astype(np.int8)
            nd = int((sub > 0).sum())
            yield dict(pos=pos, het=het, nd=nd)


# ---------------------------------------------------------------------------
# writing (golden fixtures / round-trip tests)
# ---------------------------------------------------------------------------


def _bgzf_block(payload: bytes) -> bytes:
    "One BGZF block: gzip member with the BC extra field (BSIZE = size-1)."
    raw = zlib.compressobj(6, zlib.DEFLATED, -15)
    cdata = raw.compress(payload) + raw.flush()
    bsize = len(cdata) + 25  # 18 header + 8 footer - 1
    header = struct.pack(
        "<4BIBBHBBHH", 0x1F, 0x8B, 8, 4, 0, 0, 0xFF, 6, ord("B"), ord("C"), 2, bsize
    )
    footer = struct.pack("<II", zlib.crc32(payload), len(payload) & 0xFFFFFFFF)
    return header + cdata + footer


_BGZF_EOF = bytes.fromhex(
    "1f8b08040000000000ff0600424302001b0003000000000000000000"
)


def _typed_int(v: int) -> bytes:
    if -120 <= v <= 127:
        return bytes([0x11]) + struct.pack("<b", v)
    if -32000 <= v <= 32767:
        return bytes([0x12]) + struct.pack("<h", v)
    return bytes([0x13]) + struct.pack("<i", v)


def _typed_string(s: str) -> bytes:
    b = s.encode()
    if len(b) < 15:
        return bytes([(len(b) << 4) | 7]) + b
    return bytes([0xF7]) + _typed_int(len(b)) + b


def write_bcf(path: str, header_text: str, records) -> None:
    """Encode (chrom, 1-based pos, ref, alts, genotypes) records as BCF2.2.

    ``genotypes`` is a per-record list of per-sample allele tuples, with
    None for a missing allele, e.g. [(0, 1), (None, None)].  The header text
    must contain the ##contig lines and the #CHROM sample columns.
    """
    contigs, strings, samples = _header_dicts(header_text)
    rid = {name: i for i, name in contigs.items()}
    gt_key = next(i for i, s in strings.items() if s == "GT")
    body = bytearray()
    hdr = header_text.encode() + b"\x00"
    body += _MAGIC + struct.pack("<I", len(hdr)) + hdr
    for chrom, pos, ref, alts, gts in records:
        assert len(gts) == len(samples)
        n_allele = 1 + len(alts)
        shared = bytearray()
        shared += struct.pack("<iiif", rid[chrom], pos - 1, len(ref), 0.0)
        shared += struct.pack("<II", (n_allele << 16) | 0, (1 << 24) | len(samples))
        shared += _typed_string("")  # ID
        for a in (ref, *alts):
            shared += _typed_string(a)
        shared += bytes([0x11, 0x00])  # FILTER = [PASS]
        indiv = bytearray()
        indiv += _typed_int(gt_key)
        ploidy = max(len(g) for g in gts)
        indiv += bytes([(ploidy << 4) | 1])  # int8 vector per sample
        for g in gts:
            enc = [0 if a is None else ((a + 1) << 1) for a in g]
            enc += [_EOV[1] & 0xFF] * (ploidy - len(g))
            indiv += bytes(x & 0xFF for x in enc)
        body += struct.pack("<II", len(shared), len(indiv)) + shared + indiv
    with open(path, "wb") as fh:
        view = memoryview(bytes(body))
        for at in range(0, len(view), 0xFF00):
            fh.write(_bgzf_block(bytes(view[at : at + 0xFF00])))
        fh.write(_BGZF_EOF)
