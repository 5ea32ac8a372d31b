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
    from airpollution_tpu.problems import Problem

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


def test_reference_laplacian_defect_d1_demonstrated():
    """Defect D1 (SURVEY.md): the reference's second-derivative slicing
    takes batch ROWS (``grad_c[d:d+1]``, pinn.py:467) instead of
    coordinate columns. Reconstructed literally here in torch, its
    "Laplacian" of the exact Gaussian solution yields a PDE residual that
    is NOT zero, while our corrected operator satisfies the oracle
    (tests/test_pinn.py::test_residual_of_exact_solution_is_zero)."""
    import jax.numpy as jnp
    from airpollution_tpu.ops import autodiff
    from airpollution_tpu.problems import Problem

    problem = Problem()
    v, D = np.array([1.0, 0.5]), 0.1
    rng = np.random.default_rng(3)
    pts = np.hstack([rng.uniform(-5, 5, (16, 2)),
                     rng.uniform(1, 9, (16, 1))])

    # --- reference computation, literal (pinn.py:442-469) ---
    xyt = torch.tensor(pts, dtype=torch.float64, requires_grad=True)
    denom = 4 * D * xyt[:, 2] + 1.0
    num = (xyt[:, 0] - v[0] * xyt[:, 2]) ** 2 + (
        xyt[:, 1] - v[1] * xyt[:, 2]) ** 2
    c = (torch.exp(-num / denom) / (np.pi * denom)).unsqueeze(-1)
    grad_c = torch.autograd.grad(c, xyt, torch.ones_like(c),
                                 create_graph=True, retain_graph=True)[0]
    grad_xy, grad_t = grad_c[:, :2], grad_c[:, 2:3]

    def second_derivative(component, dim):  # pinn.py:456-465
        return torch.autograd.grad(
            component, xyt, torch.ones_like(component),
            create_graph=True, retain_graph=True, allow_unused=True,
        )[0][:, dim]

    # The defect: rows d:d+1 instead of columns [:, d:d+1].
    lap_ref = sum(second_derivative(grad_c[d:d + 1], dim=d)
                  for d in range(2))
    res_ref = (grad_t.squeeze() + (torch.tensor(v) * grad_xy).sum(1)
               - D * lap_ref).detach().numpy()

    # --- our corrected operator on the same points ---
    def u(p):
        return problem.analytical_solution(p[None, :])[0]

    res_ours = np.asarray(autodiff.pde_residual(
        u, jnp.asarray(pts), problem.v, problem.D,
        jnp.zeros(len(pts)))).ravel()

    assert np.abs(res_ours).max() < 1e-10  # exact solution satisfies PDE
    assert np.abs(res_ref).max() > 1e-4  # the defective operator does not
