"""Train stage — learned preconditioner training (dvc.yaml:14-28 parity).

Mirrors the reference train entry point (train.py:139-190): params from
params.yaml, string-keyed model/dataset selection, 95/5 train/val split
of the train folders, Adam, early stopping, checkpoints + metric series.

Usage: python scripts/train.py [--max-epochs N]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(1, str(Path(__file__).resolve().parent))

from deeppreconditioning_tpu.config import (  # noqa: E402
    get_dataset_class,
    get_model_class,
    params_show,
)
from deeppreconditioning_tpu.models import plan_builder_for  # noqa: E402
from deeppreconditioning_tpu.train.trainer import train  # noqa: E402


class _SubsetView:
    """Contiguous batch-index view of a PlannedDataSet (95/5 split,
    train.py:152 random_split equivalent — split at batch granularity)."""

    def __init__(self, base, indices):
        self.base = base
        self.indices = list(indices)
        self.batch_size = base.batch_size

    def __len__(self):
        return len(self.indices)

    def __getitem__(self, i):
        return self.base[self.indices[i]]


def main() -> None:
    params = params_show()
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", default=params.model)
    args_pre, _ = parser.parse_known_args()
    if args_pre.model == "NeuralFSAI":
        # the NeuralFSAI family trains over FSAI plans, not conv plans
        import train_fsai

        train_fsai.main()
        return
    parser.add_argument("--max-epochs", type=int,
                        default=params.max_epochs)
    parser.add_argument("--loss", default=params.loss,
                        choices=["inverse_loss", "frobenius_loss",
                                 "hutchinson_trace", "condition_loss",
                                 "pcg_loss"])
    parser.add_argument("--select-by", default="loss",
                        choices=["loss", "iterations"])
    parser.add_argument("--lr", type=float, default=params.learning_rate)
    parser.add_argument("--checkpoint-dir", default=None)
    parser.add_argument("--metrics-dir", default=None)
    parser.add_argument("--init-from", default=None,
                        help="warm-start params from this checkpoint")
    parser.add_argument("--dp", type=int, default=0,
                        help="data-parallel devices (0 = single device)")
    args = parser.parse_args()

    mesh = None
    if args.dp:
        import jax
        import numpy as np
        from jax.sharding import Mesh

        devs = jax.devices()
        assert len(devs) >= args.dp, (
            f"requested dp={args.dp} but only {len(devs)} devices"
        )
        mesh = Mesh(np.array(devs[: args.dp]), ("dp",))
    # conv families keep their own artifact dirs when params.yaml's
    # flagship is NeuralFSAI
    default_ckpt = ("assets/checkpoints_v2"
                    if args.model == "PreconditionerNet"
                    else "assets/checkpoints_unet")
    default_metrics = ("assets/metrics_v2"
                       if args.model == "PreconditionerNet"
                       else "assets/metrics_unet")
    is_flagship = params.model == args.model
    ckpt_dir = args.checkpoint_dir or (
        params.checkpoint_dir if is_flagship else default_ckpt
    )
    metrics_dir = args.metrics_dir or (
        params.metrics_dir if is_flagship else default_metrics
    )

    specs = plan_builder_for(args.model, params.channels)
    dataset_cls = get_dataset_class(params.data)
    full = dataset_cls(
        stage="train",
        batch_size=params.batch_size,
        specs=specs,
        root=Path(params.data_root),
        seed=params.seed,
    )
    n_batches = len(full)
    n_val = max(1, n_batches * 5 // 100)
    train_set = _SubsetView(full, range(n_batches - n_val))
    val_set = _SubsetView(full, range(n_batches - n_val, n_batches))
    print(f"train batches: {len(train_set)}, val batches: {len(val_set)}, "
          f"dof_pad: {full.dof_pad}")

    model_cls = get_model_class(args.model)
    model = model_cls(channels=tuple(params.channels))

    state = train(
        model,
        train_set,
        val_set,
        learning_rate=args.lr,
        patience=params.patience,
        max_epochs=args.max_epochs,
        checkpoint_dir=Path(ckpt_dir),
        metrics_dir=Path(metrics_dir),
        seed=params.seed,
        loss=args.loss,
        schedule=params.schedule,
        select_by=args.select_by,
        init_from=args.init_from,
        mesh=mesh,
    )
    print(f"finished at step {int(state.step)}; checkpoints in "
          f"{ckpt_dir}")


if __name__ == "__main__":
    main()
