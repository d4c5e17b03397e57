"""DDIM sampling: whole-image and overlapping-patch tiled variants.

TPU re-design of the reference samplers (utils/sampling.py:23-107 and the
wavelet-aware copy at models/ddm_wavelet.py:437-506):

- The 25-step reverse chain compiles to ONE ``lax.scan`` -- the reference runs
  a Python loop that round-trips xs/x0_preds to host memory every step
  (utils/sampling.py:99,104); here the whole chain stays in HBM.
- The overlapping-patch engine gathers ALL patches with one XLA gather,
  runs the UNet over the full patch batch (the reference micro-batches 8
  patches per CUDA launch, models/ddm_wavelet.py:465-479), and scatter-adds
  the noise estimates onto a precomputed static count mask.
- The corner grid is static Python data (shape-dependent but deterministic,
  reference ``overlapping_grid_indices`` models/restoration.py:187-196), so
  everything inside jit has static shapes.

Semantics preserved exactly: eta=0 default, c1/c2 coefficients, the
``begin_from_noise`` knob, and the full x0-prediction trajectory is returned
so callers can select ``x0_preds[-5]`` (models/restoration.py:108).
"""

from __future__ import annotations

import functools
from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from wavedm_tpu.diffusion.schedules import alpha_bars


def fft_condition(cond: jax.Array) -> jax.Array:
    """Append FFT amplitude and phase channels to the conditioning
    (reference ``use_FFT``, utils/sampling.py:76-79 / models/ddm.py:241):
    cond -> [cond | |FFT2(cond)| | angle(FFT2(cond))], tripling channels."""
    f = jnp.fft.fft2(cond, axes=(1, 2))
    return jnp.concatenate([cond, jnp.abs(f), jnp.angle(f)], axis=-1)


def overlapping_grid_corners(h: int, w: int, p: int, r: int) -> List[Tuple[int, int]]:
    """Static overlap grid: stride-r corners covering (h, w) with p-sized
    patches, plus flush-right/bottom rows (reference
    models/restoration.py:187-196)."""
    hs = list(range(0, h - p + 1, r))
    ws = list(range(0, w - p + 1, r))
    if hs[-1] + p < h:
        hs.append(h - p)
    if ws[-1] + p < w:
        ws.append(w - p)
    return [(i, j) for i in hs for j in ws]


def _patch_indices(corners: Sequence[Tuple[int, int]], p: int):
    """(K, p) row and (K, p) col gather indices for the static corner set."""
    c = np.asarray(corners, dtype=np.int32)
    rows = c[:, 0:1] + np.arange(p, dtype=np.int32)[None, :]
    cols = c[:, 1:2] + np.arange(p, dtype=np.int32)[None, :]
    return rows, cols


def _count_mask(corners, h: int, w: int, p: int) -> np.ndarray:
    mask = np.zeros((h, w), dtype=np.float32)
    for (i, j) in corners:
        mask[i:i + p, j:j + p] += 1.0
    return mask


def _ddim_coeffs(betas: jax.Array, seq: np.ndarray, eta: float):
    """Per-step (at, at_next, c1, c2) for the reversed DDIM sequence."""
    abar = alpha_bars(betas)
    seq = np.asarray(seq)
    t_cur = seq[::-1].copy()                     # descending
    t_next = np.concatenate([[-1], seq[:-1]])[::-1].copy()
    at = abar[t_cur + 1]
    at_next = abar[t_next + 1]
    c1 = eta * jnp.sqrt((1 - at / at_next) * (1 - at_next) / (1 - at))
    c2 = jnp.sqrt((1 - at_next) - c1 ** 2)
    return (jnp.asarray(t_cur, jnp.float32), at.astype(jnp.float32),
            at_next.astype(jnp.float32), c1.astype(jnp.float32),
            c2.astype(jnp.float32))


def _dpmpp2m_coeffs(betas: jax.Array, seq: np.ndarray):
    """Per-step constants for DPM-Solver++(2M) (Lu et al. 2022), the
    data-prediction multistep second-order ODE solver.

    For each reverse step i (state at t_i -> t_{i+1}, descending noise):
      lam = log(alpha/sigma),  h_i = lam_{i+1} - lam_i
      x_{i+1} = (sig_{i+1}/sig_i) x_i - alpha_{i+1} * expm1(-h_i) * D~_i
      D~_i = (1 + c2_i) D_i - c2_i D_{i-1},  c2_i = h_i / (2 h_{i-1})
    (D~ is the data prediction linearly extrapolated in lambda to the
    midpoint of the current step -- Lu et al. 2022b, Algorithm 2, where
    c2 = 1/(2 r_i) with r_i = h_{i-1}/h_i.)
    First step and the final (sigma -> 0) step run first order (c2 = 0);
    expm1(-inf) = -1 and sig-ratio 0 make the generic update reduce to
    x = D~ at the end, so no special casing inside the scan.

    Returns (t_cur, at, sig_ratio, alpha_next, em1, c2) -- at is carried so
    the model's eps/v output converts to the data prediction D_i exactly as
    in the DDIM path.
    """
    abar = np.asarray(alpha_bars(betas), np.float64)
    seq = np.asarray(seq)
    t_cur = seq[::-1].copy()
    t_next = np.concatenate([[-1], seq[:-1]])[::-1].copy()
    a_cur = abar[t_cur + 1]
    a_next = abar[t_next + 1]
    alpha_c, sigma_c = np.sqrt(a_cur), np.sqrt(1 - a_cur)
    alpha_n, sigma_n = np.sqrt(a_next), np.sqrt(1 - a_next)
    with np.errstate(divide="ignore"):
        lam_c = np.log(alpha_c / sigma_c)
        lam_n = np.where(sigma_n > 0, np.log(
            alpha_n / np.where(sigma_n > 0, sigma_n, 1.0)), np.inf)
    h = lam_n - lam_c
    sig_ratio = np.where(sigma_c > 0, sigma_n / sigma_c, 0.0)
    em1 = np.expm1(-h)                     # exactly -1 on the final step
    c2 = np.zeros_like(h)
    if len(h) > 1:
        with np.errstate(invalid="ignore", divide="ignore"):
            c2[1:] = h[1:] / (2.0 * h[:-1])
    c2[-1] = 0.0                           # lower-order final step
    f32 = lambda x: jnp.asarray(x, jnp.float32)
    return (f32(t_cur), f32(a_cur), f32(sig_ratio), f32(alpha_n),
            f32(em1), f32(c2))


def ddim_sample(
    model_fn: Callable[[jax.Array, jax.Array], jax.Array],
    x: jax.Array,
    x_cond: jax.Array,
    seq: np.ndarray,
    betas: jax.Array,
    *,
    eta: float = 0.0,
    rng: Optional[jax.Array] = None,
    pred_type: str = "eps",
    solver: str = "ddim",
) -> Tuple[jax.Array, jax.Array]:
    """Whole-image reverse chain (reference ``generalized_steps``,
    utils/sampling.py:23-44) as one lax.scan.

    ``pred_type="v"`` consumes a velocity-parameterized model (see
    diffusion/loss.py): the output is converted to the implied epsilon
    (e = sqrt(1-a)*x_t + sqrt(a)*v) and the chain is otherwise identical.

    ``solver``: "ddim" (the reference's update rule) or "dpmpp2m"
    (DPM-Solver++(2M) -- second-order multistep; same model evaluations
    per step, materially lower discretization error at few steps, so
    ~10 steps can match DDIM-25 quality).  dpmpp2m is deterministic
    (requires eta == 0).

    Returns (x_final, x0_preds) with x0_preds stacked over steps in
    chronological order (index -1 = last step's x0 estimate).
    """
    n = x.shape[0]
    if solver not in ("ddim", "dpmpp2m"):
        raise ValueError(f"solver must be ddim or dpmpp2m, got {solver!r}")
    if solver == "dpmpp2m" and eta > 0:
        raise ValueError("dpmpp2m is deterministic; eta must be 0")
    per_steps = (_ddim_coeffs(betas, seq, eta) if solver == "ddim"
                 else _dpmpp2m_coeffs(betas, seq))
    if rng is None:
        rng = jax.random.PRNGKey(0)

    def step(carry, per_step):
        # the d_prev slot exists only for the multistep solver -- the ddim
        # carry stays (xt, key) so the hot path hauls no dead buffer
        xt, key = carry[0], carry[1]
        t, a = per_step[0], per_step[1]
        et = model_fn(jnp.concatenate([x_cond, xt], axis=-1),
                      jnp.full((n,), t))
        if pred_type == "v":
            et = jnp.sqrt(1 - a) * xt + jnp.sqrt(a) * et
        x0_t = (xt - et * jnp.sqrt(1 - a)) / jnp.sqrt(a)
        if solver == "ddim":
            _, _, a_nx, cc1, cc2 = per_step
            key, sub = jax.random.split(key)
            noise = (jax.random.normal(sub, xt.shape, xt.dtype)
                     if eta > 0 else 0.0)
            xt_next = jnp.sqrt(a_nx) * x0_t + cc1 * noise + cc2 * et
            return (xt_next, key), x0_t
        _, _, sig_ratio, alpha_n, em1, cc2 = per_step
        d_tilde = (1 + cc2) * x0_t - cc2 * carry[2]
        xt_next = sig_ratio * xt - alpha_n * em1 * d_tilde
        return (xt_next, key, x0_t), x0_t

    carry0 = ((x, rng) if solver == "ddim"
              else (x, rng, jnp.zeros_like(x)))
    final_carry, x0_preds = jax.lax.scan(step, carry0, per_steps)
    return final_carry[0], x0_preds


def make_overlapping_sampler(
    model_fn: Callable[[jax.Array, jax.Array], jax.Array],
    *,
    image_shape: Tuple[int, int],
    patch_size: int,
    grid_r: int,
    seq: np.ndarray,
    betas: jax.Array,
    pred_channels: int,
    eta: float = 0.0,
    use_other: bool = False,
    use_fft: bool = False,
    use_global: bool = False,
    patch_micro_batch: int = 0,
    jit_mode: str = "scan",
    mesh=None,
    x0_keep: Optional[int] = None,
    pred_type: str = "eps",
    solver: str = "ddim",
):
    """Build the jitted tiled DDIM sampler for a fixed eval geometry.

    The returned function maps
      (x_init (B,H,W,pred), x_cond (B,H,W,Cc), x_other (B,H,W,Co)|None, rng)
      -> (x_final, x0_preds (T,B,H,W,pred))
    running the full chain on-device.  The reference equivalent is
    ``generalized_steps_overlapping`` (models/ddm_wavelet.py:437-506) --
    which is strictly 1 image/program; here a batch of B images denoises as
    one (B*K)-patch UNet batch per step (image-major order), amortizing
    dispatch and filling the chip.

    With ``use_global`` the sample fn takes an extra ``x_global``
    whole-image tensor handed to the model alongside every patch batch
    (reference ``total_batch``, utils/sampling.py:80-87 /
    models/ddm_wavelet.py:481-484) -- kept at batch 1 here; the model's
    AttnGlobal broadcasts its k/v tokens across the K patches instead of
    re-encoding a K-fold repeat.

    With ``mesh`` (a 1-D data mesh) the K-patch batch is sharded over the
    mesh's data axis: each device denoises its slice of the patch grid and
    XLA inserts the collectives for the scatter-add recombination -- patch
    parallelism for inference, a capability the reference (single-GPU eval,
    eval_diffusion.py world_size=1) does not have.

    ``x0_keep``: when set (an index into the T-step trajectory, negative ok),
    the scan carries ONLY that x0 estimate instead of stacking all T --
    x0_preds comes back as (1, B, H, W, pred) holding just the kept step.
    The full trajectory is T*B*H*W*pred floats of HBM (52 MB at T=25, B=8,
    720x480) and only one element is ever consumed
    (reference x0_preds[-5], models/restoration.py:108).

    eta > 0 note: the per-step stochastic noise is drawn with per-image
    subkeys (fold over the batch axis), so each image's noise is independent
    of its batch neighbours -- but exact equality between one batched call
    and B single-image calls holds only at eta=0 (the reference's only
    shipped setting): a single-image call consumes a different key path than
    a batch slice.
    """
    h, w = image_shape
    p = patch_size
    corners = overlapping_grid_corners(h, w, p, grid_r)
    K = len(corners)
    # Corner/count tensors are passed as ARGUMENTS into the jitted programs
    # (bound below) and the (K, p) index grids are rebuilt inside with iota:
    # closing over them would embed multi-MB gather/scatter index literals in
    # the HLO (enough to overflow proxied compile services).
    corners_np = jnp.asarray(np.asarray(corners, np.int32))
    counts_np = jnp.asarray(_count_mask(corners, h, w, p))[None, :, :, None]
    if solver not in ("ddim", "dpmpp2m"):
        raise ValueError(f"solver must be ddim or dpmpp2m, got {solver!r}")
    if solver == "dpmpp2m" and eta > 0:
        raise ValueError("dpmpp2m is deterministic; eta must be 0")
    per_steps = (_ddim_coeffs(betas, seq, eta) if solver == "ddim"
                 else _dpmpp2m_coeffs(betas, seq))

    if mesh is not None and getattr(mesh, "size", 1) > 1:
        from jax.sharding import NamedSharding, PartitionSpec
        from wavedm_tpu.parallel.mesh import DATA_AXIS
        _patch_sh = NamedSharding(mesh, PartitionSpec(DATA_AXIS))

        def shard_patches(x):
            return jax.lax.with_sharding_constraint(x, _patch_sh)
    else:
        def shard_patches(x):
            return x

    def _index_grids(corners_a):
        ar = jnp.arange(p, dtype=jnp.int32)
        rows_j = corners_a[:, 0:1] + ar[None, :]
        cols_j = corners_a[:, 1:2] + ar[None, :]
        return rows_j, cols_j

    def gather_patches(img, corners_a):
        # (B, H, W, C) -> (B*K, p, p, C), image-major patch order
        rows_j, cols_j = _index_grids(corners_a)
        pat = img[:, rows_j[:, :, None], cols_j[:, None, :], :]
        return pat.reshape((-1,) + pat.shape[2:])

    def apply_model(params, patches, t, x_global):
        # patches: (N, p, p, Cin) -> eps (N, p, p, pred), N = B*K
        n = patches.shape[0]
        call = (model_fn if params is None
                else functools.partial(model_fn, params))
        if use_global:
            base = call
            call = lambda xx, tt: base(xx, tt, x_global)
        if patch_micro_batch and n > patch_micro_batch:
            mb = patch_micro_batch
            pad = (-n) % mb
            padded = jnp.pad(patches, ((0, pad), (0, 0), (0, 0), (0, 0)))
            chunks = padded.reshape(-1, mb, p, p, patches.shape[-1])
            out = jax.lax.map(
                lambda ch: call(ch, jnp.full((mb,), t)), chunks)
            return out.reshape(-1, p, p, pred_channels)[:n]
        return call(patches, jnp.full((n,), t))

    def step(params, carry, per_step, cond_p, other_p, x_global,
             corners_a, counts_a):
        # ddim carry is (xt, key); dpmpp2m appends its d_prev slot -- the
        # hot reference-protocol path hauls no dead (B,H,W,C) buffer
        xt, key = carry[0], carry[1]
        t, a = per_step[0], per_step[1]
        b = xt.shape[0]
        xt_p = gather_patches(xt, corners_a)
        inp = [cond_p, xt_p] + ([other_p] if use_other else [])
        et_p = apply_model(
            params, shard_patches(jnp.concatenate(inp, axis=-1)), t, x_global)
        # scatter-add the B*K noise estimates per image, normalize by coverage
        rows_j, cols_j = _index_grids(corners_a)
        acc = jnp.zeros((b, h, w, pred_channels), et_p.dtype)
        et_b = et_p.reshape(b, K, p, p, pred_channels)
        acc = acc.at[:, rows_j[:, :, None], cols_j[:, None, :], :].add(et_b)
        et = acc / counts_a
        if pred_type == "v":
            # v -> implied epsilon AFTER the overlap average: the conversion
            # is affine per-pixel in (v, x_t) and the count-normalized
            # scatter of gathered x_t patches reproduces x_t exactly, so
            # averaging v then converting equals converting per patch then
            # averaging.
            et = jnp.sqrt(1 - a) * xt + jnp.sqrt(a) * et
        x0_t = (xt - et * jnp.sqrt(1 - a)) / jnp.sqrt(a)
        if solver == "ddim":
            _, _, a_nx, cc1, cc2 = per_step
            key, sub = jax.random.split(key)
            if eta > 0:
                # per-image subkeys: noise independent of batch composition
                noise = jax.vmap(
                    lambda k: jax.random.normal(k, xt.shape[1:], xt.dtype)
                )(jax.random.split(sub, b))
            else:
                noise = 0.0
            xt_next = jnp.sqrt(a_nx) * x0_t + cc1 * noise + cc2 * et
            return (xt_next, key), x0_t
        # dpmpp2m multistep update on the data prediction
        _, _, sig_ratio, alpha_n, em1, cc2 = per_step
        d_tilde = (1 + cc2) * x0_t - cc2 * carry[2]
        xt_next = sig_ratio * xt - alpha_n * em1 * d_tilde
        return (xt_next, key, x0_t), x0_t

    def prep_cond(x_cond, x_other, corners_a):
        cond_p = gather_patches(x_cond, corners_a)   # static across steps
        if use_fft:
            # per-patch FFT conditioning (reference utils/sampling.py:76-79)
            cond_p = fft_condition(cond_p)
        cond_p = shard_patches(cond_p)
        other_p = (shard_patches(gather_patches(x_other, corners_a))
                   if use_other else None)
        return cond_p, other_p

    n_steps = len(np.asarray(seq))
    keep_idx = None if x0_keep is None else (x0_keep % n_steps)

    if jit_mode == "scan":
        # one compiled program for the whole reverse chain
        @jax.jit
        def sample_scan(params, x_init, x_cond, x_other, x_global, rng,
                        corners_a, counts_a):
            cond_p, other_p = prep_cond(x_cond, x_other, corners_a)
            carry0 = ((x_init, rng) if solver == "ddim"
                      else (x_init, rng, jnp.zeros_like(x_init)))
            if keep_idx is None:
                final_c, x0_preds = jax.lax.scan(
                    lambda c, per: step(params, c, per, cond_p, other_p,
                                        x_global, corners_a, counts_a),
                    carry0, per_steps)
                return final_c[0], x0_preds

            # carry only the kept x0 estimate (no T-step trajectory in HBM)
            flags = jnp.arange(n_steps) == keep_idx

            def body(carry, per):
                inner, kept = carry
                inner, x0_t = step(params, inner, per[:-1], cond_p, other_p,
                                   x_global, corners_a, counts_a)
                kept = jnp.where(per[-1], x0_t, kept)
                return (inner, kept), None

            (final_c, kept), _ = jax.lax.scan(
                body, (carry0, jnp.zeros_like(x_init)),
                per_steps + (flags,))
            return final_c[0], kept[None]

        def sample(x_init, x_cond, x_other=None, rng=None,
                   params=None, x_global=None):
            if rng is None:
                rng = jax.random.PRNGKey(0)
            return sample_scan(params, x_init, x_cond, x_other, x_global,
                               rng, corners_np, counts_np)

        return sample

    if jit_mode != "step":
        raise ValueError(f"jit_mode must be 'scan' or 'step', got {jit_mode!r}")

    # segmented mode: one compiled program PER STEP, Python-driven chain.
    # Same math; trades ~T dispatch overheads for a much smaller compiled
    # program (needed where a compile-size cap bites, e.g. proxied compilers).
    prep_jit = jax.jit(prep_cond)
    step_jit = jax.jit(step)

    def sample_segmented(x_init, x_cond, x_other=None, rng=None,
                         params=None, x_global=None):
        if rng is None:
            rng = jax.random.PRNGKey(0)
        cond_p, other_p = prep_jit(x_cond, x_other, corners_np)
        carry = ((x_init, rng) if solver == "ddim"
                 else (x_init, rng, jnp.zeros_like(x_init)))
        x0s = []
        for i in range(n_steps):
            per_step = tuple(arr[i] for arr in per_steps)
            carry, x0_t = step_jit(params, carry, per_step, cond_p, other_p,
                                   x_global, corners_np, counts_np)
            if keep_idx is None or i == keep_idx:
                x0s.append(x0_t)
        return carry[0], jnp.stack(x0s)

    return sample_segmented
