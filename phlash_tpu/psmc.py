"""PSMC-compatibility entry point: fit directly from .psmcfa files.

(reference: /root/reference/src/phlash/psmc.py:8-29)
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
        hold_out: reserve the first contig as a test set for early stopping.
        **options: forwarded to phlash_tpu.fit.
    """
    logger.info("reading PSMC data")
    contigs = [
        c for f in psmcfa_files for c in RawContig.from_psmcfa_iter(f, window_size)
    ]
    test_data = None
    if hold_out and len(contigs) > 1:
        test_data = contigs.pop(0)
    return phlash_tpu.fit(contigs, test_data=test_data, **options)
