"""Pipeline orchestrator — `dvc repro` equivalent (dvc.yaml:1-43 parity).

Runs the three stages in dependency order, skipping stages whose outputs
already exist (content-addressed skipping like dvc.lock is overkill for
seeded deterministic stages; presence + force flags cover the workflow):

    generate  ->  assets/data/raw/sludge_patterns/
    train     ->  assets/checkpoints/best.msgpack
    test      ->  assets/results/table.csv

Usage: python scripts/repro.py [--force] [--stages generate,train,test]
"""

import argparse
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _run(script: str, *args: str) -> None:
    cmd = [sys.executable, str(REPO / "scripts" / script), *args]
    print(f"$ {' '.join(cmd)}", flush=True)
    subprocess.run(cmd, check=True, cwd=REPO)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--force", action="store_true",
                        help="re-run stages even if outputs exist")
    parser.add_argument("--stages", default="generate,train,test")
    args = parser.parse_args()
    stages = args.stages.split(",")

    sys.path.insert(0, str(REPO))
    from deeppreconditioning_tpu.config import params_show

    params = params_show(REPO / "params.yaml")

    if "generate" in stages:
        out = REPO / params.data_root / "sludge_patterns"
        have = len(list(out.glob("case_*"))) if out.exists() else 0
        if args.force or have < params.number_samples:
            _run("generate_data.py")
        else:
            print(f"generate: {have} cases present, skipping")

    if "train" in stages:
        ckpt = REPO / params.checkpoint_dir / "best.msgpack"
        if args.force or not ckpt.exists():
            _run("train.py")
        else:
            print(f"train: {ckpt} present, skipping")

    if "test" in stages:
        table = REPO / params.results_dir / "table.csv"
        if args.force or not table.exists():
            _run("test.py")
        else:
            print(f"test: {table} present, skipping")


if __name__ == "__main__":
    main()
