"""Checkpoint integrity check (reference: script/check_sum.py)."""
import argparse
import hashlib


def main():
    p = argparse.ArgumentParser()
    p.add_argument("path")
    p.add_argument("--expect", default="")
    args = p.parse_args()
    h = hashlib.sha256()
    with open(args.path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    digest = h.hexdigest()
    print(digest)
    if args.expect:
        assert digest == args.expect, "checksum mismatch!"
        print("checksum OK")


if __name__ == "__main__":
    main()
