"""Checkpoint port-tool tests: round-trip oracle (flax → torch-style →
flax must be exact) plus the reference's surgery cases
(module. prefixes, .net shift wrappers, fc shape mismatch;
reference tsm.py:451-473, tdn.py:46-72)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import traverse_util

from workoutdetector_tpu.models import TSM
from workoutdetector_tpu.models.convert import (flax_to_torch_dict, merge_into,
                                                port_tsm_checkpoint,
                                                strip_ddp_prefix,
                                                strip_shift_wrappers,
                                                torch_resnet_to_flax)


@pytest.fixture(scope="module")
def tsm_variables():
    model = TSM(num_class=12, num_segments=4, base_model="resnet18")
    return model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 32, 32, 3)))


def test_roundtrip_exact(tsm_variables):
    torch_dict = flax_to_torch_dict(tsm_variables)
    # sanity: torchvision-style keys exist
    assert "base_model.conv1.weight" in torch_dict
    assert "base_model.layer1.0.bn1.running_mean" in torch_dict
    assert "fc.weight" in torch_dict
    assert torch_dict["base_model.conv1.weight"].shape == (64, 3, 7, 7)

    ported = port_tsm_checkpoint(torch_dict, num_class=12)
    want_p = traverse_util.flatten_dict(tsm_variables["params"])
    got_p = traverse_util.flatten_dict(ported["params"])
    assert set(want_p) == set(got_p)
    for k in want_p:
        np.testing.assert_array_equal(np.asarray(want_p[k]), got_p[k], err_msg=str(k))
    want_s = traverse_util.flatten_dict(tsm_variables["batch_stats"])
    got_s = traverse_util.flatten_dict(ported["batch_stats"])
    assert set(want_s) == set(got_s)
    for k in want_s:
        np.testing.assert_array_equal(np.asarray(want_s[k]), got_s[k])


def test_ddp_prefix_and_shift_wrappers(tsm_variables):
    torch_dict = flax_to_torch_dict(tsm_variables)
    # simulate a DDP+TemporalShift-wrapped checkpoint
    messy = {}
    for k, v in torch_dict.items():
        k2 = "module." + k
        # the torch TemporalShift wraps block conv1s: conv1.weight → conv1.net.weight
        if ".conv1.weight" in k2 and "layer" in k2:
            k2 = k2.replace(".conv1.weight", ".conv1.net.weight")
        messy[k2] = v
    ported = port_tsm_checkpoint(messy, num_class=12)
    want = traverse_util.flatten_dict(tsm_variables["params"])
    got = traverse_util.flatten_dict(ported["params"])
    assert set(want) == set(got)
    for k in want:
        np.testing.assert_array_equal(np.asarray(want[k]), got[k])


def test_fc_mismatch_dropped(tsm_variables):
    torch_dict = flax_to_torch_dict(tsm_variables)  # fc is 12-class
    ported = port_tsm_checkpoint(torch_dict, num_class=5,
                                 target_params=tsm_variables["params"])
    # backbone came from the checkpoint...
    np.testing.assert_array_equal(
        np.asarray(ported["params"]["backbone"]["conv1"]["kernel"]),
        np.asarray(tsm_variables["params"]["backbone"]["conv1"]["kernel"]))
    # ...and the mismatched fc was dropped, keeping the target's head
    assert np.asarray(ported["params"]["fc"]["kernel"]).shape[-1] == 12  # target's


def test_merge_into_skips_mismatched_shapes(tsm_variables):
    params = tsm_variables["params"]
    src = {"fc": {"kernel": np.zeros((999, 5))}}
    merged = merge_into(params, src)
    assert np.asarray(merged["fc"]["kernel"]).shape == \
        np.asarray(params["fc"]["kernel"]).shape


def test_ported_weights_run(tsm_variables):
    """Ported params must actually drive the model to the same logits."""
    model = TSM(num_class=12, num_segments=4, base_model="resnet18")
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, 4, 32, 32, 3)).astype(np.float32))
    y_orig = model.apply(tsm_variables, x)
    ported = port_tsm_checkpoint(flax_to_torch_dict(tsm_variables), num_class=12)
    y_port = model.apply(
        {"params": ported["params"], "batch_stats": ported["batch_stats"]}, x)
    np.testing.assert_allclose(np.asarray(y_orig), np.asarray(y_port), atol=1e-5)


def test_strip_helpers():
    sd = {"module.a.b": 1, "c.net.d": 2}
    assert strip_ddp_prefix(sd) == {"a.b": 1, "c.net.d": 2}
    assert strip_shift_wrappers(sd) == {"module.a.b": 1, "c.d": 2}


def test_tdn_port_roundtrip():
    """TDN port: flax → torch-style dict → flax must be exact, and ported
    params must drive the model to identical logits."""
    from workoutdetector_tpu.models import TDN
    from workoutdetector_tpu.models.convert import (flax_tdn_to_torch_dict,
                                                    port_tdn_checkpoint)

    model = TDN(num_class=4, num_segments=2)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, 2, 5, 32, 32, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)

    torch_dict = flax_tdn_to_torch_dict(variables)
    # torch-style key layout sanity
    assert "base_model.conv1.weight" in torch_dict
    assert "base_model.conv1_5.0.weight" in torch_dict
    assert "base_model.conv1_5.1.running_mean" in torch_dict
    assert "base_model.layer2_bak.0.mse.conv1.weight" in torch_dict
    assert "base_model.layer2_bak.0.shift.conv.weight" in torch_dict
    assert torch_dict["base_model.layer2_bak.0.shift.conv.weight"].ndim == 3
    assert "base_model.resnext_layer1.0.conv1.weight" in torch_dict
    assert "new_fc.weight" in torch_dict

    ported = port_tdn_checkpoint(torch_dict, num_class=4)
    want_p = traverse_util.flatten_dict(variables["params"])
    got_p = traverse_util.flatten_dict(ported["params"])
    assert set(want_p) == set(got_p), \
        (sorted(set(want_p) - set(got_p))[:5], sorted(set(got_p) - set(want_p))[:5])
    for k in want_p:
        np.testing.assert_array_equal(np.asarray(want_p[k]), got_p[k], err_msg=str(k))
    want_s = traverse_util.flatten_dict(variables["batch_stats"])
    got_s = traverse_util.flatten_dict(ported["batch_stats"])
    assert set(want_s) == set(got_s)

    y0 = model.apply(variables, x)
    y1 = model.apply({"params": ported["params"],
                      "batch_stats": ported["batch_stats"]}, x)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=1e-5)


def test_tdn_port_fc_mismatch():
    from workoutdetector_tpu.models import TDN
    from workoutdetector_tpu.models.convert import (flax_tdn_to_torch_dict,
                                                    port_tdn_checkpoint)

    model = TDN(num_class=4, num_segments=2)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 2, 5, 32, 32, 3)))
    torch_dict = flax_tdn_to_torch_dict(variables)  # 4-class head
    ported = port_tdn_checkpoint(torch_dict, num_class=7,
                                 target_params=variables["params"])
    # mismatched head dropped; backbone intact
    np.testing.assert_array_equal(
        np.asarray(ported["params"]["conv1"]["kernel"]),
        np.asarray(variables["params"]["conv1"]["kernel"]))
