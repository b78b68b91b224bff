"""PSMC-compatibility entry point: fit directly from .psmcfa files.

Capability match for the reference's psmc() helper
(/root/reference/src/phlash/psmc.py:8-29): parse Li & Durbin-style
binned-heterozygosity FASTA, optionally set aside held-out data for the
ELPD early-stopping criterion, and hand everything to the SVGD driver.
"""

from __future__ import annotations

import logging

import phlash_tpu
from phlash_tpu.data import RawContig
from phlash_tpu.size_history import DemographicModel

logger = logging.getLogger(__name__)


def psmc(
    psmcfa_files: list[str], window_size: int = 100, hold_out: bool = True, **options
) -> list[DemographicModel]:
    """Run inference on PSMC-formatted (.psmcfa) input files.

    Args:
        psmcfa_files: input files (the window size is the `-s` used when the
            files were produced by fq2psmcfa, usually 100).
        hold_out: reserve one contig as a test set for early stopping.
        **options: forwarded to phlash_tpu.fit.
    """
    logger.info("reading PSMC data from %d file(s)", len(psmcfa_files))
    contigs: list[RawContig] = []
    for path in psmcfa_files:
        contigs.extend(RawContig.from_psmcfa_iter(path, window_size))
    if not contigs:
        raise ValueError(f"no contigs found in {psmcfa_files}")
    test_data = contigs.pop(0) if hold_out and len(contigs) > 1 else None
    return phlash_tpu.fit(contigs, test_data=test_data, **options)
