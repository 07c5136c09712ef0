"""In-step ablation: time the REAL jitted train step under config/geometry
deltas to attribute the 357 ms. Honest chained timing (K steps, one fetch).
Each variant changes exactly one thing vs the bench default.
"""
import json, sys, time
import jax, jax.numpy as jnp, numpy as np
from neuspeech1_tpu import enable_compilation_cache
from neuspeech1_tpu.config import StemConfig, WhisperConfig
from neuspeech1_tpu.models.init import init_params
from neuspeech1_tpu.models.lora import init_lora
from neuspeech1_tpu.train import optimizer as opt
from neuspeech1_tpu.train import trainstep as ts
enable_compilation_cache()

BS = 64


def measure(tag, config, in_ch=208, label_len=64, lora_rank=32,
            fold_lora=True, no_update=False, K=20, batch_size=None):
    bs = batch_size or BS
    stem = StemConfig("base", in_channels=in_ch)
    params = init_params(jax.random.key(0), config, stem)
    lora = (init_lora(jax.random.key(1), config, rank=lora_rank, alpha=64)
            if lora_rank else None)
    tx = opt.make_optimizer(peak_lr=1e-3, warmup_steps=500, total_steps=100_000)
    state, frozen = ts.init_train_state(
        jax.random.key(2), params, lora, tx, opt.default_trainable_pred())
    if no_update:
        loss_fn = ts.make_loss_fn(config, stem, fold_lora=fold_lora)

        @jax.jit
        def step(state, frozen, batch):
            grads, aux = jax.grad(loss_fn, has_aux=True)(
                state.trainable, frozen, batch, None)
            # fold grads into the rng leaf so the chain stays data-dependent
            gsum = jax.tree_util.tree_reduce(
                lambda a, b: a + jnp.sum(b).astype(jnp.float32), grads, 0.0)
            aux = dict(aux)
            aux["loss"] = aux["loss"] + gsum * 1e-30
            new_state = ts.TrainState(
                step=state.step + 1,
                trainable=jax.tree_util.tree_map(
                    lambda t, g: t + 1e-30 * g.astype(t.dtype), state.trainable, grads),
                opt_state=state.opt_state, rng=state.rng, ipt=state.ipt)
            return new_state, aux
    else:
        step = ts.make_train_step(config, stem, tx, fold_lora=fold_lora)
    rng = np.random.default_rng(0)
    batch = {
        "input_features": jnp.asarray(
            rng.standard_normal((bs, in_ch, 6000)).astype(np.float32)),
        "labels": jnp.asarray(
            rng.integers(0, 50000, (bs, label_len)).astype(np.int32)),
        "decoder_input_ids": jnp.asarray(
            rng.integers(0, 50000, (bs, label_len)).astype(np.int32)),
    }
    try:
        t0 = time.perf_counter()
        state, m = step(state, frozen, batch)
        float(jax.device_get(m["loss"]))
        compile_s = time.perf_counter() - t0
        state, m = step(state, frozen, batch)
        float(jax.device_get(m["loss"]))
        totals = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(K):
                state, m = step(state, frozen, batch)
            float(jax.device_get(m["loss"]))
            totals.append(time.perf_counter() - t0)
        dt = sorted(totals)[1] / K
        print(json.dumps({"variant": tag, "step_ms": round(dt * 1e3, 1),
                          "compile_s": round(compile_s, 1)}), flush=True)
    except Exception as e:
        print(json.dumps({"variant": tag, "error": str(e)[:250]}), flush=True)
    finally:
        del state, frozen, params, lora, batch


C = WhisperConfig  # remat default policy flash_qkv

VARIANTS = {
    "base": lambda: measure("base", C(remat=True)),
    "enc0": lambda: measure("enc0", C(remat=True, encoder_layers=1)),
    "enc3": lambda: measure("enc3", C(remat=True, encoder_layers=3)),
    "dec1": lambda: measure("dec1", C(remat=True, decoder_layers=1)),
    "lab8": lambda: measure("lab8", C(remat=True), label_len=8),
    "ch8": lambda: measure("ch8", C(remat=True), in_ch=8),
    "noflash": lambda: measure("noflash", C(remat=True, flash_attention="off",
                                            remat_policy="full")),
    "nofold": lambda: measure("nofold", C(remat=True), fold_lora=False),
    "nolora": lambda: measure("nolora", C(remat=True), lora_rank=0),
    "noupd": lambda: measure("noupd", C(remat=True), no_update=True),
    "polmlp": lambda: measure("polmlp", C(remat=True, remat_policy="flash_mlp")),
    "polflash": lambda: measure("polflash", C(remat=True, remat_policy="flash")),
    "decflash": lambda: measure("decflash", C(remat=True, decoder_flash_min_q=1)),
    "bs128": lambda: measure("bs128", C(remat=True), batch_size=128, K=10),
    "noremat": lambda: measure("noremat", C(remat=False)),
    "unroll2": lambda: measure("unroll2", C(remat=True, scan_unroll=2)),
    "unroll6": lambda: measure("unroll6", C(remat=True, scan_unroll=6)),
}

if __name__ == "__main__":
    names = sys.argv[1:] or ["base", "enc3", "dec1", "lab8", "ch8",
                             "nofold", "noupd"]
    for n in names:
        VARIANTS[n]()
