"""TDN torch→JAX numerical parity (extends the round-2 TSM gates to the
second model family). Oracle: scripts/torch_tdn.TorchTDN with the
reference state-dict layout (layer{i}_bak, resnext_layer1, mse.*,
shift.conv, conv1_5.{0,1}) flowing through port_tdn_checkpoint."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from workoutdetector_tpu.models.convert import port_tdn_checkpoint
from workoutdetector_tpu.models.tdn import TDN
from workoutdetector_tpu.ops.preprocess import IMAGENET_MEAN, IMAGENET_STD

SIZE = 32
T = 4


def _randomize(model: torch.nn.Module, seed: int = 0) -> None:
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0.0, 0.2, generator=g)
                m.running_var.uniform_(0.5, 1.5, generator=g)
                m.weight.uniform_(0.5, 1.5, generator=g)
                m.bias.normal_(0.0, 0.1, generator=g)
            if isinstance(m, torch.nn.Conv1d):  # shift taps: off-init
                m.weight.add_(0.2 * torch.randn(m.weight.shape, generator=g))


@pytest.fixture(scope="module")
def pair():
    import jax
    import jax.numpy as jnp

    from workoutdetector_tpu.scripts.torch_tdn import TorchTDN

    torch.manual_seed(0)
    tmodel = TorchTDN(num_class=3, num_segments=T, dropout=0.0).eval()
    _randomize(tmodel)

    fmodel = TDN(num_class=3, num_segments=T, num_frames=5, dropout=0.0,
                 dtype=jnp.float32)
    x0 = jnp.zeros((1, T, 5, SIZE, SIZE, 3), jnp.float32)
    init = fmodel.init({"params": jax.random.PRNGKey(0)}, x0, train=False)
    tree = port_tdn_checkpoint(tmodel.state_dict(), num_class=3,
                               target_params=init["params"])
    variables = {"params": tree["params"],
                 "batch_stats": tree["batch_stats"]}
    return tmodel, fmodel, variables, init


def test_tdn_port_batch_stats_complete(pair):
    from flax import traverse_util
    _, _, variables, init = pair
    want = set(traverse_util.flatten_dict(init["batch_stats"]).keys())
    got = set(traverse_util.flatten_dict(variables["batch_stats"]).keys())
    assert want == got, f"missing: {want - got}, extra: {got - want}"


def test_tdn_port_params_complete(pair):
    from flax import traverse_util
    _, _, variables, init = pair
    want = set(traverse_util.flatten_dict(init["params"]).keys())
    got = set(traverse_util.flatten_dict(variables["params"]).keys())
    assert want == got, f"missing: {want - got}, extra: {got - want}"


def test_tdn_logits_parity(pair):
    tmodel, fmodel, variables, _ = pair
    rng = np.random.default_rng(1)
    x = rng.integers(0, 256, (2, T, 5, SIZE, SIZE, 3), dtype=np.uint8)
    mean = np.asarray(IMAGENET_MEAN, np.float32)
    std = np.asarray(IMAGENET_STD, np.float32)
    xn = (x.astype(np.float32) / 255.0 - mean) / std  # (B,T,5,H,W,C)
    with torch.no_grad():
        t_out = tmodel(torch.from_numpy(
            np.transpose(xn, (0, 1, 2, 5, 3, 4)).copy())).numpy()
    f_out = np.asarray(fmodel.apply(variables, xn, train=False))
    assert t_out.shape == f_out.shape == (2, 3)
    np.testing.assert_allclose(f_out, t_out, atol=2e-4, rtol=1e-4)
