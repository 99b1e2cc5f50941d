"""Sensor fusion — BASELINE.json workload #3 (reference
examples/sensor_fusion/script.jl): one latent process observed through two
sensors with different, structured noise models; joint conditioning across
both recovers the latent function.

Model (matching the reference's @gppp block semantics):
  f      ~ GP(SE)                                  latent signal
  noise1 = 0.1 * GP(White) + (sin(x) - 5 + sqrt|x|)  sensor-1 noise (known
                                                     weird mean, low var)
  noise2 = sqrt(0.1) * GP(3.5, White)              sensor-2 noise (bias 3.5)
  y1 = f + noise1 ; y2 = f + noise2                what we actually measure

Run: python examples/sensor_fusion.py [--platform cpu]
"""

import sys

import jax

if "--platform" in sys.argv:
    jax.config.update("jax_platforms", sys.argv[sys.argv.index("--platform") + 1])
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

import stheno_tpu as st
from stheno_tpu import (
    BlockData,
    GPPPInput,
    gppp,
    marginals,
    posterior,
    rand,
    split,
)


@gppp
def model():
    f = st.GP(st.SEKernel())
    noise1 = jnp.sqrt(1e-2) * st.GP(st.WhiteKernel()) + (
        lambda x: jnp.sin(x) - 5.0 + jnp.sqrt(jnp.abs(x))
    )
    noise2 = jnp.sqrt(1e-1) * st.GP(3.5, st.WhiteKernel())
    y1 = f + noise1
    y2 = f + noise2
    return dict(f=f, noise1=noise1, noise2=noise2, y1=y1, y2=y2)


def main():
    key = jax.random.PRNGKey(123456)
    rng = np.random.default_rng(123456)
    f = model()

    # toy observations of y1 (3 points) and y2 (10 points)
    x1 = GPPPInput("y1", jnp.asarray(np.sort(rng.uniform(0, 10, 3))))
    x2 = GPPPInput("y2", jnp.asarray(np.sort(rng.uniform(0, 10, 10))))
    x = BlockData(x1, x2)
    yhat = rand(key, f(x, 1e-12))
    y1hat, y2hat = split(x, yhat)
    print(f"sensor1 obs: {np.asarray(y1hat).round(2)}")
    print(f"sensor2 obs mean: {float(np.mean(np.asarray(y2hat))):.2f} "
          f"(bias sqrt(0.1)*3.5 = {np.sqrt(0.1)*3.5:.2f})")

    # joint posterior over latent f AND both sensor processes
    post = posterior(f(x, 1e-12), yhat)
    xp = jnp.linspace(-2.5, 12.5, 500)
    xp_all = BlockData(
        GPPPInput("f", xp), GPPPInput("y1", xp), GPPPInput("y2", xp)
    )
    ms = marginals(post(xp_all, 1e-9))
    mf, m1, m2 = split(xp_all, ms.mean)
    vf, v1, v2 = split(xp_all, ms.var)

    # posterior means of the sensors differ from the latent by their noise
    # means: y1 - f ≈ sin(x) - 5 + sqrt|x|; y2 - f ≈ sqrt(0.1)·3.5 (the
    # scaling multiplies the mean too — exactly as in the reference model)
    noise1_mean = np.sin(xp) - 5.0 + np.sqrt(np.abs(xp))
    bias2 = np.sqrt(1e-1) * 3.5
    err1 = float(np.max(np.abs((np.asarray(m1) - np.asarray(mf)) - noise1_mean)))
    err2 = float(np.max(np.abs((np.asarray(m2) - np.asarray(mf)) - bias2)))
    print(f"|E[y1-f] - noise1_mean|_inf = {err1:.2e}")
    print(f"|E[y2-f] - {bias2:.3f}|_inf        = {err2:.2e}")
    assert err1 < 1e-6 and err2 < 1e-6

    # latent variance collapses near observations, grows away from them
    var_at_obs = np.interp(np.asarray(x2.x), xp, np.asarray(vf))
    var_far = float(np.asarray(vf)[0])  # x = -2.5, far from data
    assert var_far > np.max(var_at_obs)
    print(
        f"latent var near data: {float(np.max(var_at_obs)):.3f}; "
        f"far from data: {var_far:.3f}"
    )

    # joint posterior samples stay consistent: y2 - f - 3.5 has White cov
    ys = rand(key, post(xp_all, 1e-9), 7)
    sf, s1, s2 = split(xp_all, ys)
    assert np.all(np.isfinite(np.asarray(ys)))
    print("sensor_fusion: OK")


if __name__ == "__main__":
    main()
