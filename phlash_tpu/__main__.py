"""Command-line interface: `python -m phlash_tpu fit ...`.

The reference has no CLI ("phlash does not (yet) have a command-line
interface" — its docs); this thin wrapper covers the common cases: fit from
.psmcfa / .vcf(.gz) / tree-sequence inputs, save the posterior, optionally
plot it.
"""

from __future__ import annotations

import argparse
import logging
import sys


def _add_fit(sub):
    p = sub.add_parser("fit", help="sample the posterior size history from genome data")
    p.add_argument("inputs", nargs="+", help=".psmcfa/.vcf/.vcf.gz/.bcf/.trees/.tsz files")
    p.add_argument("--samples", nargs="*", default=None, help="sample ids (VCF) ")
    p.add_argument("--region", action="append", default=None,
                   help='VCF region per input, e.g. "chr1:1-100000000"')
    p.add_argument("--mutation-rate", type=float, default=None)
    p.add_argument("--niter", type=int, default=1000)
    p.add_argument("--particles", type=int, default=500)
    p.add_argument("--window-size", type=int, default=100)
    p.add_argument("--hold-out", action="store_true",
                   help="reserve the first contig for ELPD early stopping")
    p.add_argument("--checkpoint", default=None, help="checkpoint path (resumable)")
    p.add_argument("--out", default="posterior.npz")
    p.add_argument("--plot", default=None, help="write a posterior plot PNG here")
    p.add_argument("--seed", type=int, default=1)
    return p


def _load_contigs(args):
    import phlash_tpu
    from phlash_tpu.data import RawContig

    contigs = []
    regions = list(args.region or [])
    for src in args.inputs:
        if src.endswith(".psmcfa") or src.endswith(".psmcfa.gz"):
            contigs.extend(RawContig.from_psmcfa_iter(src, args.window_size))
        elif any(src.endswith(x) for x in (".vcf", ".vcf.gz", ".bcf")):
            if not regions:
                raise SystemExit(f"--region required for VCF input {src}")
            contigs.append(
                phlash_tpu.contig(src, samples=args.samples, region=regions.pop(0))
            )
        else:
            contigs.append(phlash_tpu.contig(src, samples=args.samples))
    return contigs


def main(argv=None) -> int:
    logging.basicConfig(level=logging.INFO, format="%(levelname)s %(name)s: %(message)s")
    ap = argparse.ArgumentParser(prog="phlash_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)
    _add_fit(sub)
    sub.add_parser("bench", help="run the throughput benchmark (one JSON line)")
    args = ap.parse_args(argv)

    if args.cmd == "bench":
        import runpy

        runpy.run_path("bench.py", run_name="__main__")
        return 0

    import jax

    import phlash_tpu
    from phlash_tpu.results import save_posterior

    contigs = _load_contigs(args)
    test = contigs.pop(0) if args.hold_out and len(contigs) > 1 else None
    posterior = phlash_tpu.fit(
        contigs,
        test_data=test,
        niter=args.niter,
        num_particles=args.particles,
        window_size=args.window_size,
        mutation_rate=args.mutation_rate,
        checkpoint_path=args.checkpoint,
        key=jax.random.PRNGKey(args.seed),
    )
    save_posterior(args.out, posterior)
    print(f"wrote {len(posterior)} posterior samples to {args.out}")
    if args.plot:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots()
        phlash_tpu.plot_posterior(posterior, ax=ax)
        fig.savefig(args.plot, dpi=150)
        print(f"wrote {args.plot}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
