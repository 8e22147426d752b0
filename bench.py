"""Benchmark: full VMC training-step wall-clock on the local accelerator.

Measures the production configuration of the BASELINE.json north star:
n=13 electrons, 2D, Emax=25, global batch 8192, Hutchinson Laplacian,
hybrid-Fisher SR, 50 Metropolis sweeps per step — one full training step =
joint sampling + observable/gradient/Fisher accumulation + SR update.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is speedup relative to the round-1 measurement on a single
TPU v5e chip (the reference publishes no wall-clock numbers — see
BASELINE.md; this pins our own first measurement as the yardstick, so
values > 1 mean faster than round 1).
"""

import json
import time

# Round-1 single-chip TPU v5e measurement (seconds per full training step).
PINNED_BASELINE_SECONDS = 5.5144


def build(batch=8192, n=13, Emax=25, mc_steps=50):
    import jax

    import __graft_entry__ as ge

    parts = ge._build_stack(
        n=n, dim=2, Emax=Emax, batch=batch, hutchinson=True, sr=True, mc_steps=mc_steps,
        microbatch=2048,
    )
    sample_jit = jax.jit(parts["sample_step"], donate_argnums=(2,))
    accumulate_jit = jax.jit(parts["accumulate"], donate_argnums=(5,))
    apply_jit = jax.jit(parts["apply_update"])
    return parts, sample_jit, accumulate_jit, apply_jit


def _retry(fn, *args, tries=4):
    """Retry a jitted call: the remote TPU compile helper fails sporadically
    (HTTP 500 surfacing as UNIMPLEMENTED); successful compiles persist in the
    on-disk cache, so retries converge."""
    for attempt in range(tries):
        try:
            return fn(*args)
        except Exception as e:  # jax.errors.JaxRuntimeError
            msg = str(e)
            transient = "UNIMPLEMENTED" in msg or "remote_compile" in msg
            if attempt == tries - 1 or not transient:
                raise
            import time as _t

            _t.sleep(3.0)


def main():
    import jax

    parts, sample_jit, accumulate_jit, apply_jit = build()
    params_van, params_flow = parts["params_van"], parts["params_flow"]
    opt_state, x, key = parts["opt_state"], parts["x"], parts["key"]

    def step(x, key, params_van, params_flow, opt_state):
        key, k1, k2 = jax.random.split(key, 3)
        acc = parts["init_acc"]()
        state_indices, x, accept = _retry(sample_jit, params_van, params_flow, x, k1)
        acc = _retry(accumulate_jit, params_van, params_flow, state_indices, x, k2, acc)
        params_van, params_flow, opt_state, data = _retry(
            apply_jit, params_van, params_flow, opt_state, acc
        )
        jax.block_until_ready((x, params_van, data))
        return x, key, params_van, params_flow, opt_state, data

    # warmup (compilation)
    for _ in range(2):
        x, key, params_van, params_flow, opt_state, data = step(
            x, key, params_van, params_flow, opt_state
        )

    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        x, key, params_van, params_flow, opt_state, data = step(
            x, key, params_van, params_flow, opt_state
        )
    dt = (time.perf_counter() - t0) / iters

    print(
        json.dumps(
            {
                "metric": "vmc_train_step_n13_batch8192_hutchinson_sr",
                "value": round(dt, 4),
                "unit": "s/step",
                "vs_baseline": round(PINNED_BASELINE_SECONDS / dt, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
