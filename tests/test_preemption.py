"""Preemption handling: SIGTERM mid-training → clean 'last' checkpoint +
resumable exit (TPU-pod eviction behavior; the reference has no failure
handling, SURVEY §5)."""

import os
import signal
import subprocess
import sys
import textwrap

import pytest


def test_sigterm_saves_last_checkpoint(tmp_path):
    script = textwrap.dedent(f"""
        import os, signal, threading
        import jax
        jax.config.update("jax_platforms", "cpu")
        from workoutdetector_tpu.config import Config
        from workoutdetector_tpu.train.trainer import Trainer

        cfg = Config()
        cfg.model.model_type = "tsm"; cfg.model.base_model = "resnet18"
        cfg.model.num_class = 2; cfg.model.num_segments = 4
        cfg.model.dropout = 0.0; cfg.model.dtype = "float32"
        cfg.data.dataset_type = "DebugDataset"; cfg.data.debug_num_class = 2
        cfg.data.debug_size = 64; cfg.data.batch_size = 8
        cfg.data.num_segments = 4; cfg.data.image_size = 16
        cfg.data.num_workers = 2
        cfg.trainer.default_root_dir = r"{tmp_path}/exp"
        cfg.trainer.max_epochs = 200  # would run forever without the signal
        cfg.log.tensorboard_enable = False

        trainer = Trainer(cfg)
        # deliver SIGTERM to ourselves shortly after training starts
        threading.Timer(20.0, lambda: os.kill(os.getpid(), signal.SIGTERM)).start()
        state, history = trainer.fit(ckpt_dir=r"{tmp_path}/ckpts")
        print("PREEMPTED", history.get("preempted"), int(state.step))
    """)
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    proc = subprocess.run([sys.executable, "-c", script], capture_output=True,
                          text=True, timeout=300,
                          cwd=os.path.dirname(os.path.dirname(
                              os.path.abspath(__file__))), env=env)
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = [l for l in proc.stdout.splitlines() if l.startswith("PREEMPTED")]
    assert out, proc.stdout[-500:]
    _, flag, step = out[0].split()
    assert flag == "1.0"
    assert int(step) > 0
    assert os.path.isdir(os.path.join(str(tmp_path), "ckpts", "last"))
