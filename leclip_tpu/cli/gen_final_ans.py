"""Standalone ensemble fusion CLI — the reference's `gen_final_ans.py` step
for workflows that save per-model dumps and fuse later (the single-pass
`cli.eval` already does this inline).

Consumes the pickles written by `inference.pipeline.run_full_inference`
(`data.pkl` + `sim_matrix.pkl`) and writes the competition `impreds.json`.
"""

from __future__ import annotations

import argparse
import pickle


def main(argv=None):
    ap = argparse.ArgumentParser(description="fuse saved TTA dumps → impreds.json")
    ap.add_argument("--data", required=True, help="data.pkl from run_full_inference")
    ap.add_argument("--sim-matrix", required=True, help="sim_matrix.pkl")
    ap.add_argument("--out", default="impreds.json")
    ap.add_argument("--base", default="best")
    ap.add_argument("--coef", type=float, default=1.5)
    args = ap.parse_args(argv)

    from ..ops.ensemble import generate_final_answers

    with open(args.data, "rb") as f:
        data = pickle.load(f)
    with open(args.sim_matrix, "rb") as f:
        sims = pickle.load(f)
    fused = generate_final_answers(
        data, sims["sims_blocks_all"], base=args.base, coef=args.coef,
        out_path=args.out,
    )
    print(f"wrote {args.out}: {fused.shape[0]} images × {fused.shape[1]} classes")


if __name__ == "__main__":
    main()
