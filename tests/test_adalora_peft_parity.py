"""AdaLoRA allocator parity vs PEFT's RankAllocator (installed in image).

Drives PEFT's allocator and ours with IDENTICAL parameter values and
synthetic gradient sequences, then asserts the sensitivity/uncertainty EMAs
and the mask (rank-pattern) trajectory match step for step — the VERDICT r1
requirement that "PEFT-faithful" be machine-checked, not claimed.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
peft = pytest.importorskip("peft")

import jax
import jax.numpy as jnp

from neuspeech1_tpu.models.lora import (
    adalora_budget_schedule,
    adalora_ipt_init,
    adalora_ipt_update,
    adalora_mask_to_budget,
    adalora_total_ranks,
    adalora_triplet_scores,
)

INIT_R, TARGET_R = 4, 2
TINIT, TFINAL, DELTA_T, TOTAL = 2, 3, 2, 10
IN_F = OUT_F = 8


class TwoLinear(torch.nn.Module):
    def __init__(self):
        super().__init__()
        self.fc1 = torch.nn.Linear(IN_F, OUT_F)
        self.fc2 = torch.nn.Linear(IN_F, OUT_F)

    def forward(self, x):  # pragma: no cover - never called
        return self.fc2(self.fc1(x))


@pytest.fixture(scope="module")
def peft_model():
    cfg = peft.AdaLoraConfig(
        init_r=INIT_R, target_r=TARGET_R, tinit=TINIT, tfinal=TFINAL,
        deltaT=DELTA_T, total_step=TOTAL, target_modules=["fc1", "fc2"],
        beta1=0.85, beta2=0.85, lora_alpha=8,
    )
    torch.manual_seed(0)
    return peft.get_peft_model(TwoLinear(), cfg)


def _peft_lora_params(model):
    """{(layer, kind): tensor} for lora_A/B/E of the default adapter."""
    out = {}
    for n, p in model.named_parameters():
        for kind in ("lora_A", "lora_B", "lora_E"):
            if f"{kind}.default" in n:
                layer = "fc1" if ".fc1." in n else "fc2"
                out[(layer, kind)] = p
    assert len(out) == 6
    return out


def _to_jax_tree(params):
    """Mirror PEFT values into our [L=1, ...] stacked-entry layout."""
    def entry(layer):
        a = params[(layer, "lora_A")].detach().numpy()   # [r, in]
        b = params[(layer, "lora_B")].detach().numpy()   # [out, r]
        e = params[(layer, "lora_E")].detach().numpy()   # [r, 1]
        return {
            "A": jnp.asarray(a.T[None]),                 # [1, in, r]
            "B": jnp.asarray(b.T[None]),                 # [1, r, out]
            "E": jnp.asarray(e[None]),                   # [1, r, 1]
            "alpha": jnp.full((1, 1, 1), 8.0),
            "mask": jnp.ones((1, INIT_R, 1)),
        }

    return {"enc": {"layers": {"fc1": entry("fc1"), "fc2": entry("fc2")}}}


def _grad_for(shape, step, idx, scale=1.0):
    rng = np.random.default_rng(1000 * step + idx)
    return rng.standard_normal(shape).astype(np.float32) * scale


def test_mask_trajectory_matches_peft(peft_model):
    params = _peft_lora_params(peft_model)
    allocator = peft_model.base_model.rankallocator

    lora = _to_jax_tree(params)
    ipt = adalora_ipt_init(lora)
    init_bgt = adalora_total_ranks(lora)
    assert init_bgt == allocator.init_bgt == 2 * INIT_R

    order = [("fc1", "lora_A"), ("fc1", "lora_B"), ("fc1", "lora_E"),
             ("fc2", "lora_A"), ("fc2", "lora_B"), ("fc2", "lora_E")]

    for step in range(TOTAL):
        # identical synthetic grads on both sides
        grads_np = {}
        for idx, key in enumerate(order):
            g = _grad_for(tuple(params[key].shape), step, idx)
            grads_np[key] = g
            params[key].grad = torch.from_numpy(g)

        # model-level API (handles the force-mask boundary + frozen pattern)
        peft_model.base_model.update_and_allocate(step)
        rank_pattern = peft_model.peft_config["default"].rank_pattern or None

        # ours: same grads in our layout
        def g_entry(layer):
            return {
                "A": jnp.asarray(grads_np[(layer, "lora_A")].T[None]),
                "B": jnp.asarray(grads_np[(layer, "lora_B")].T[None]),
                "E": jnp.asarray(grads_np[(layer, "lora_E")][None]),
                "alpha": jnp.zeros((1, 1, 1)),
                "mask": jnp.zeros((1, INIT_R, 1)),
            }

        gtree = {"enc": {"layers": {"fc1": g_entry("fc1"),
                                    "fc2": g_entry("fc2")}}}
        if step < TOTAL - TFINAL:
            ipt = adalora_ipt_update(ipt, lora, gtree)
        budget, mask_ind = adalora_budget_schedule(
            step, init_bgt, 2 * TARGET_R, TINIT, TFINAL, TOTAL, DELTA_T
        )
        if mask_ind or step == TOTAL - TFINAL:
            scores = adalora_triplet_scores(ipt)
            lora = adalora_mask_to_budget(lora, scores, budget, init_bgt)

            # compare rank pattern (PEFT keys end in lora_E.default)
            for layer in ("fc1", "fc2"):
                peft_key = [k for k in rank_pattern if k.startswith(f"{layer}.")][0]
                theirs = np.asarray(rank_pattern[peft_key], dtype=np.float32)
                ours = np.asarray(
                    lora["enc"]["layers"][layer]["mask"]
                )[0, :, 0]
                np.testing.assert_array_equal(ours, theirs.ravel(), err_msg=f"step {step} {layer}")
                # E must hold zeros exactly where pruned (PEFT masked_fill)
                e_theirs = params[(layer, "lora_E")].detach().numpy()
                e_ours = np.asarray(lora["enc"]["layers"][layer]["E"])[0]
                np.testing.assert_allclose(e_ours, e_theirs, atol=1e-6)

        # EMA parity every step (A tensors as representative)
        if step < TOTAL - TFINAL:
            for layer in ("fc1", "fc2"):
                n = [k for k in allocator.exp_avg_ipt
                     if k.startswith(f"{layer}.") and "lora_A" in k][0]
                theirs_avg = allocator.exp_avg_ipt[n].numpy()
                theirs_unc = allocator.exp_avg_unc[n].numpy()
                ours_avg = np.asarray(
                    ipt["avg"]["enc"]["layers"][layer]["A"])[0].T
                ours_unc = np.asarray(
                    ipt["unc"]["enc"]["layers"][layer]["A"])[0].T
                np.testing.assert_allclose(ours_avg, theirs_avg, atol=1e-6)
                np.testing.assert_allclose(ours_unc, theirs_unc, atol=1e-6)


def test_pruned_ranks_can_revive():
    """mask gates nothing in the forward: a pruned rank whose E regrows
    (gradient flow continues, PEFT semantics) contributes again."""
    from neuspeech1_tpu.models.lora import lora_delta

    entry = {
        "A": jnp.ones((2, 3)),
        "B": jnp.ones((3, 4)),
        "E": jnp.asarray([[1.0], [0.0], [1.0]]),
        "mask": jnp.asarray([[1.0], [0.0], [1.0]]),
        "alpha": jnp.asarray(3.0),
    }
    x = jnp.ones((1, 2))
    base = lora_delta(x, entry)
    # E revives at the pruned rank while mask still says 0 — the delta must
    # change (forward reads E, not mask)
    revived = dict(entry, E=jnp.asarray([[1.0], [0.5], [1.0]]))
    assert not np.allclose(np.asarray(base), np.asarray(lora_delta(x, revived)))
    # gradients flow to pruned-rank E
    g = jax.grad(lambda e: lora_delta(x, dict(entry, E=e)).sum())(entry["E"])
    assert float(g[1, 0]) != 0.0
