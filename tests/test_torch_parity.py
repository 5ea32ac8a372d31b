"""Cross-framework parity oracles against torch (the reference's stack).

These tests build the reference's torch modules (pinn.py:29-49, :101-122
architecture) with weights copied from our initialization and check that
forward passes and loss components agree — validating the C14/C12 parity
claims numerically rather than by reading code."""

import numpy as np
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from airpollution_tpu.models.pinn import init_mlp_params, mlp_apply


def _torch_forward(params, x, activation):
    """The reference's Sequential forward (pinn.py:101-129) with our
    weights loaded."""
    layers = []
    with torch.no_grad():
        for i, layer in enumerate(params):
            lin = torch.nn.Linear(*layer["W"].shape)
            lin.weight.copy_(torch.tensor(np.asarray(layer["W"]).T))
            lin.bias.copy_(torch.tensor(np.asarray(layer["b"])))
            layers.append(lin)
            if i < len(params) - 1:
                if activation == "tanh":
                    layers.append(torch.nn.Tanh())
                elif activation == "sine":
                    class Sine(torch.nn.Module):  # pinn.py:29-31
                        def forward(self, x):
                            return torch.sin(x)
                    layers.append(Sine())
                elif activation == "swish":
                    class Swish(torch.nn.Module):  # pinn.py:36-38
                        def forward(self, x):
                            return x * torch.sigmoid(x)
                    layers.append(Swish())
                elif activation == "adaptive_tanh":
                    class AdaptiveTanh(torch.nn.Module):  # pinn.py:42-49
                        def __init__(self, alpha):
                            super().__init__()
                            self.alpha = torch.nn.Parameter(alpha)

                        def forward(self, x):
                            return torch.tanh(self.alpha * x)
                    layers.append(AdaptiveTanh(
                        torch.tensor(np.asarray(layer["alpha"]))
                    ))
        model = torch.nn.Sequential(*layers)
        return model(torch.tensor(x, dtype=torch.float32)).numpy()


@pytest.mark.parametrize("act", ["tanh", "sine", "swish", "adaptive_tanh"])
def test_forward_matches_torch(act):
    import jax

    params = init_mlp_params(jax.random.PRNGKey(0), [3, 16, 16, 1], act)
    x = np.random.default_rng(0).uniform(-2, 2, (20, 3)).astype(np.float32)
    ours = np.asarray(mlp_apply(params, jnp.asarray(x), act))
    theirs = _torch_forward(params, x, act)
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_mse_components_match_torch():
    """IC/BC MSE terms equal torch's nn.MSELoss (pinn.py:99, :200-208)."""
    import jax
    from airpollution_tpu.models.pinn import composite_loss
    from airpollution_tpu.problems import Domain, Problem

    params = init_mlp_params(jax.random.PRNGKey(1), [3, 8, 1], "tanh")
    problem = Problem()
    rng = np.random.default_rng(2)
    xyt = np.hstack([rng.uniform(-20, 20, (32, 2)),
                     rng.uniform(0, 10, (32, 1))]).astype(np.float32)
    target = rng.normal(size=(32, 1)).astype(np.float32)

    _, (_, ic_loss, _) = composite_loss(
        params, problem, jnp.asarray(xyt), jnp.asarray(xyt),
        jnp.asarray(target), jnp.asarray(xyt), jnp.asarray(target),
        {"pde": 0.0, "ic": 1.0, "bc": 0.0}, None, "tanh",
    )
    pred = _torch_forward(params, xyt, "tanh")
    expect = torch.nn.MSELoss(reduction="mean")(
        torch.tensor(pred), torch.tensor(target)
    ).item()
    np.testing.assert_allclose(float(ic_loss), expect, rtol=1e-5)
