"""Generate stage — FVM pressure-Poisson dataset (dvc.yaml:2-13 parity).

Replaces the reference's OpenFOAM-in-Docker pipeline
(generate_data.py:84-111) with the native FVM assembler in
deeppreconditioning_tpu/data/fvm.py.  Same seed (69420), same sample
count knob, same on-disk case layout.

Usage: python scripts/generate_data.py [--samples N] [--mesh-cells M]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from deeppreconditioning_tpu.config import params_show  # noqa: E402
from deeppreconditioning_tpu.data.fvm import (  # noqa: E402
    generate_sludge_case,
    generate_sludge_case_3d,
    save_case,
)

import numpy as np  # noqa: E402


def main() -> None:
    params = params_show()
    parser = argparse.ArgumentParser()
    parser.add_argument("--samples", type=int,
                        default=params.number_samples)
    parser.add_argument("--mesh-cells", type=int,
                        default=params.mesh_cells)
    parser.add_argument("--root", type=Path,
                        default=Path(params.data_root))
    parser.add_argument(
        "--family", default="2d", choices=["2d", "3d"],
        help="2d: structured sludge tanks (reference parity); "
        "3d: castellated 3-D meshes, every other case randomly "
        "permuted (non-banded split)",
    )
    args = parser.parse_args()

    rng = np.random.default_rng(69420)  # generate_data.py:15 seed parity
    suffix = "" if args.family == "2d" else "_3d"
    out = args.root / f"sludge_patterns{suffix}"
    start = time.perf_counter()
    for i in range(args.samples):
        if args.family == "3d":
            case = generate_sludge_case_3d(
                rng, mesh_cells=args.mesh_cells, castellated=True,
                permute=bool(i % 2),
            )
        else:
            case = generate_sludge_case(rng, mesh_cells=args.mesh_cells)
        save_case(case, out / f"case_{i:04d}")
        if (i + 1) % 50 == 0:
            rate = (i + 1) / (time.perf_counter() - start)
            print(f"{i + 1}/{args.samples} cases ({rate:.1f}/s)")
    print(f"done: {args.samples} cases in "
          f"{time.perf_counter() - start:.1f}s -> {out}")


if __name__ == "__main__":
    main()
