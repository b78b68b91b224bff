"""ctypes binding for the C VCF genotype tokenizer (_fastvcf.c).

The shared library is compiled on first use with the system compiler and
cached next to the source; failures (no compiler, sandboxed filesystem)
degrade gracefully to the pure-Python parser in phlash_tpu.data.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import tempfile

import numpy as np

logger = logging.getLogger(__name__)

_HERE = os.path.dirname(__file__)
_SRC = os.path.join(_HERE, "_fastvcf.c")
_LIB_PATH = os.path.join(_HERE, "_fastvcf.so")
_lib = None
_tried = False


def _build() -> str | None:
    for cc in ("cc", "gcc", "clang"):
        try:
            out = _LIB_PATH
            subprocess.run(
                [cc, "-O3", "-shared", "-fPIC", "-o", out, _SRC],
                check=True,
                capture_output=True,
                timeout=120,
            )
            return out
        except (OSError, subprocess.SubprocessError) as e:
            logger.debug("fastvcf build with %s failed: %s", cc, e)
    # source dir may be read-only: try a temp dir
    try:
        out = os.path.join(tempfile.mkdtemp(prefix="phlash_fastvcf_"), "_fastvcf.so")
        subprocess.run(
            ["cc", "-O3", "-shared", "-fPIC", "-o", out, _SRC],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return out
    except (OSError, subprocess.SubprocessError):
        return None


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    path = _LIB_PATH if os.path.exists(_LIB_PATH) else _build()
    if path is None:
        logger.info("fastvcf C extension unavailable; using pure-Python VCF parser")
        return None
    lib = ctypes.CDLL(path)
    lib.phlash_parse_vcf.restype = ctypes.c_long
    lib.phlash_parse_vcf.argtypes = [
        ctypes.c_char_p,
        ctypes.c_long,
        ctypes.c_char_p,
        ctypes.c_long,
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
        ctypes.c_long,
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int8, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        ctypes.c_long,
    ]
    _lib = lib
    return _lib


def vcf_parser_backend() -> str:
    "'c' when the native tokenizer is available, else 'python'."
    return "c" if _load() is not None else "python"


def parse_vcf_lines(
    text: bytes, sample_cols: list[int], contig: str = None, max_records: int = None
):
    """Tokenize VCF body text with the C extension.

    Args:
        text: raw VCF body bytes (header lines starting with '#' are skipped).
        sample_cols: 0-based tab-column indices of the requested samples,
            ascending.
        contig: only keep records whose CHROM equals this (None = all).
        max_records: output capacity (default: number of newlines).

    Returns:
        (pos int64 (R,), het int8 (R, S), nd int32 (R,)) or None when the
        native backend is unavailable.
    """
    lib = _load()
    if lib is None:
        return None
    if max_records is None:
        max_records = text.count(b"\n") + 1
    S = len(sample_cols)
    cols = np.asarray(sorted(sample_cols), dtype=np.int64)
    pos = np.empty(max_records, dtype=np.int64)
    het = np.empty((max_records, S), dtype=np.int8)
    nd = np.empty(max_records, dtype=np.int32)
    cb = contig.encode() if contig else b""
    n = lib.phlash_parse_vcf(
        text, len(text), cb, len(cb), cols, S, pos, het.reshape(-1), nd, max_records
    )
    return pos[:n], het[:n], nd[:n]
