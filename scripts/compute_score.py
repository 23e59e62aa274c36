"""Standalone scoring CLI (reference: script/compute_score.py).

Usage: python scripts/compute_score.py samples.pt ref_val_airplane.pt

Golden numbers from the reference's released checkpoints (the parity
targets, script/compute_score.py:17-44 / BASELINE.md):
  car:      1-NNA-CD 0.534091  1-NNA-EMD 0.511364  MMD-CD 0.000913
            MMD-EMD 0.007523  COV-CD 0.500000  COV-EMD 0.565341  JSD 0.009229
  chair:    1-NNA-CD 0.537009  1-NNA-EMD 0.523414  MMD-CD 0.002643
            MMD-EMD 0.015516  COV-CD 0.489426  COV-EMD 0.521148  JSD 0.013535
  airplane: 1-NNA-CD 0.674074  1-NNA-EMD 0.612346  MMD-CD 0.000221
            MMD-EMD 0.003706  COV-CD 0.471605  COV-EMD 0.496296  JSD 0.060703
"""
import argparse
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("samples", help="generated samples .pt")
    p.add_argument("ref", help="reference set .pt")
    p.add_argument("--norm_box", action="store_true")
    p.add_argument("--dataset", default="")
    p.add_argument("--batch_size", type=int, default=256)
    args = p.parse_args()

    from lion_tpu.eval import compute_score
    results = compute_score(args.samples, args.ref,
                            batch_size_test=args.batch_size,
                            norm_box=args.norm_box, dataset=args.dataset)
    for k, v in sorted(results.items()):
        print(f"{k}: {v}")


if __name__ == "__main__":
    main()
