"""Export CLI: orbax checkpoint (or fresh init) → deployable .jaxm artifact.

The reference's export scripts (scripts/export_model.py:12-64 onnx export,
trainer.py:325-330 to_onnx) re-expressed over utils/export.py jax.export.

    python -m workoutdetector_tpu.scripts.export_model \
        --cfg configs/repcount_12_tsm.yaml --checkpoint exp/.../best \
        -o model.jaxm [--batch 16] [--torch-ckpt tsm_sthv2.pth]
"""

from __future__ import annotations

import argparse
import os


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description="Export model for deployment")
    parser.add_argument("--cfg", default=None)
    parser.add_argument("--checkpoint", default=None, help="orbax ckpt path")
    parser.add_argument("--torch-ckpt", default=None,
                        help="torch .pth to port instead of an orbax ckpt")
    parser.add_argument("-o", "--output", required=True)
    parser.add_argument("--batch", type=int, default=16,
                        help="window batch the artifact is compiled for")
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("opts", nargs="*")
    args = parser.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from workoutdetector_tpu.config import load_config
    from workoutdetector_tpu.models.factory import build_model, example_input
    from workoutdetector_tpu.utils.export import export_model

    cfg = load_config(args.cfg, args.opts)
    model = build_model(cfg.model)
    variables = model.init({"params": jax.random.PRNGKey(cfg.seed)},
                           example_input(cfg.model), train=False)
    if args.checkpoint:
        from workoutdetector_tpu.train.checkpoint import CheckpointManager
        mgr = CheckpointManager(os.path.dirname(args.checkpoint) or ".")
        restored = mgr.restore_variables(args.checkpoint)
        variables = {"params": restored["params"],
                     "batch_stats": restored.get(
                         "batch_stats", variables.get("batch_stats", {}))}
    elif args.torch_ckpt:
        from workoutdetector_tpu.models.convert import (load_torch_checkpoint,
                                                        port_tdn_checkpoint,
                                                        port_tsm_checkpoint)
        port = port_tdn_checkpoint if cfg.model.model_type.lower() == "tdn" \
            else port_tsm_checkpoint
        tree = port(load_torch_checkpoint(args.torch_ckpt),
                    num_class=cfg.model.num_class,
                    target_params=variables["params"])
        variables = {"params": tree["params"],
                     "batch_stats": tree.get("batch_stats",
                                             variables.get("batch_stats", {}))}

    # derive the traced shape from the factory's canonical example input:
    # TDN is rank-6 (B, T, 5, H, W, C) and TimeSformer pins its own
    # model.image_size — hand-built rank-5 shapes broke both
    shape = example_input(cfg.model, batch=args.batch,
                          image_size=cfg.data.image_size).shape
    path = export_model(model, variables, args.output, input_shape=shape,
                        meta={"model_type": cfg.model.model_type,
                              "num_class": cfg.model.num_class,
                              "checkpoint": args.checkpoint or args.torch_ckpt})
    print(f"exported to {path} (+ {path}.json)")


if __name__ == "__main__":
    main()
