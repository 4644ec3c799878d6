"""The driver-contract dryrun at scale (VERDICT r2 weak #5).

dryrun_multichip was only ever externally checked at n=8; divisibility
and min-shard assumptions in param_spec, pipeline stage counts, and MoE
capacity had never run at 16 devices. This gate runs the REAL driver
entry in a subprocess with 16 virtual CPU devices and requires every
phase — including the widened model axis (4 pipeline stages, 8 experts)
and the composed fsdp+tensor+sp+ep phase — to pass.
"""

import os
import subprocess
import sys

import pytest


@pytest.mark.parametrize("n,expect_model", [(16, 4)])
def test_dryrun_multichip_at_scale(n, expect_model):
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # the entry sets its own device count
    env["N_DEVICES"] = str(n)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run([sys.executable, "__graft_entry__.py"],
                         capture_output=True, text=True, cwd=repo,
                         env=env, timeout=2400)
    assert out.returncode == 0, out.stderr[-3000:]
    text = out.stdout
    data = n // expect_model
    assert f"mesh={{'data': {data}, 'model': {expect_model}}}" in text, text
    for phase in ("dryrun_multichip ok", "fsdp ok", "sp ok",
                  f"pp ok: {expect_model} stages == sequential",
                  f"ep ok: {2 * expect_model} experts over "
                  f"model={expect_model}",
                  "composed ok: fsdp+tensor+sp+ep",
                  "slice ok"):
        assert phase in text, (phase, text)
