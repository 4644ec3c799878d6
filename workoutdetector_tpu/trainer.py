"""Train/test CLI — the reference's `python workoutdetector/trainer.py
--cfg ... [opts]` entry (reference trainer.py:339-385), same flags, typed
config."""

from __future__ import annotations

import argparse

from workoutdetector_tpu.config import Config, load_config


def parse_args(argv=None) -> argparse.Namespace:
    parser = argparse.ArgumentParser(description="Train a workout model on TPU")
    parser.add_argument("--cfg", dest="cfg_file", default=None,
                        help="Path to the config yaml")
    parser.add_argument("--cpu", action="store_true",
                        help="force CPU backend (debug)")
    parser.add_argument("opts", nargs=argparse.REMAINDER,
                        help="dotted config overrides, e.g. model.num_class=12")
    args = parser.parse_args(argv)
    # REMAINDER swallows flags that follow the first override — without
    # this, `... model.num_class=2 --cpu` loses --cpu (and on this image a
    # lost --cpu means a tunneled-TPU run that looks like a hang)
    if "--cpu" in args.opts:
        args.opts = [o for o in args.opts if o != "--cpu"]
        args.cpu = True
    return args


def main(argv=None) -> None:
    args = parse_args(argv)
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    cfg = load_config(args.cfg_file, [o for o in args.opts if o])

    import numpy as np
    np.random.seed(cfg.seed)

    from workoutdetector_tpu.train.trainer import test, train
    if cfg.train:
        history = train(cfg)
    else:
        history = test(cfg)
    print({k: round(float(v), 4) for k, v in history.items()})


if __name__ == "__main__":
    main()
