"""Typed configuration system.

Mirrors the reference's YAML schema (reference: configs/raindrop_wavelet.yml,
configs/raindrop.yml; parsed by ``dict2namespace`` at train_diffusion.py:48-56)
but with typed dataclasses, defaults, and eager validation so stale/missing
keys fail at load time rather than deep inside the train loop (the reference's
``use_FFT`` class of bug, models/ddm.py:241).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Tuple

import yaml


class ConfigError(ValueError):
    """Raised when a config file fails validation."""


@dataclass
class DataConfig:
    dataset: str = "RainDrop"
    image_size: int = 64          # UNet working resolution (wavelet domain)
    patch_size: int = 256         # pixel-domain crop size fed to the wavelet dec
    lap: bool = False             # Laplacian-pyramid domain transform
    global_attn: bool = False     # global-attention UNet variant
    wavelet: bool = True          # wavelet-domain diffusion
    wavelet_in_unet: bool = False # apply DWT/IWT inside the UNet forward
    use_window: bool = False      # window (pixel-shuffle) reshaping in the UNet
    window_size: int = 2
    begin_from_noise: bool = True # start DDIM from pure noise (vs noised cond)
    use_fft: bool = False         # append FFT amp/phase to the conditioning
    channels: int = 3             # pixel channels (pixel-space path)
    num_workers: int = 8          # native-loader decode threads (n_threads)
    # Decode the train split once and keep it resident in HBM (uint8);
    # per-step crops become on-device gathers driven by a ~100-byte index
    # transfer (wavedm_tpu/data/device_cache.py).  RainDrop's full split is
    # ~1.8 GB of a v5e's 16 GB.  Ignored on the global-attn path (which
    # needs per-image total tensors).
    device_cache: bool = False
    data_dir: str = "./data"
    conditional: bool = True

    def validate(self) -> None:
        if self.wavelet and self.patch_size % 4 != 0:
            raise ConfigError("wavelet path needs patch_size divisible by 4")
        if self.wavelet and not self.wavelet_in_unet:
            if self.image_size * 4 != self.patch_size:
                raise ConfigError(
                    "wavelet config requires image_size == patch_size / 4 "
                    f"(got image_size={self.image_size}, patch_size={self.patch_size})")
        if self.use_window and self.window_size < 1:
            raise ConfigError("window_size must be >= 1")
        if self.global_attn and self.use_window:
            raise ConfigError(
                "global_attn does not compose with use_window (the reference "
                "DiffusionUNet_Global has no window hooks, models/unet.py:397)")
        if self.global_attn and self.wavelet_in_unet:
            raise ConfigError(
                "global_attn does not compose with wavelet_in_unet")
        if self.global_attn and not self.conditional:
            raise ConfigError("global_attn requires conditional")
        if self.lap and self.wavelet:
            raise ConfigError(
                "lap is a pixel-path domain transform (the reference wires it "
                "only in models/ddm.py:131-138); set wavelet: false")
        if self.lap and self.use_fft:
            raise ConfigError(
                "lap + use_fft is untested in the reference (no shipped "
                "config enables either) and unsupported here")
        if self.lap and self.global_attn:
            raise ConfigError(
                "lap + global_attn is unsupported: the reference would feed "
                "full-resolution global tokens to a quarter-resolution patch "
                "stream; no shipped config composes them")
        if self.lap and self.patch_size % 4 != 0:
            raise ConfigError(
                "lap path needs patch_size divisible by 4 (2-level pyramid)")


@dataclass
class ModelConfig:
    in_channels: int = 48
    out_ch: int = 3
    pred_channels: int = 3
    use_other_channels: bool = True
    other_channels_begin: int = 3
    use_gt_in_train: bool = True
    ch: int = 128
    ch_mult: Tuple[int, ...] = (1, 2, 4, 6)
    num_res_blocks: int = 2
    attn_resolutions: Tuple[int, ...] = (16,)
    dropout: float = 0.0
    ema_rate: float = 0.9999
    # Accepted for reference-YAML compatibility; DEAD IN THE REFERENCE TOO:
    # EMAHelper is registered unconditionally (models/ddm.py:146-147) and
    # `model.ema` is never read.  EMA here is likewise always maintained
    # (rate = ema_rate); evaluation chooses weights via --ema.
    ema: bool = True
    resamp_with_conv: bool = True

    def __post_init__(self):
        self.ch_mult = tuple(self.ch_mult)
        self.attn_resolutions = tuple(self.attn_resolutions)

    def validate(self) -> None:
        if self.pred_channels > self.in_channels:
            raise ConfigError("pred_channels cannot exceed in_channels")
        if self.use_other_channels and self.other_channels_begin > self.in_channels:
            raise ConfigError("other_channels_begin out of range")
        if not 0.0 <= self.dropout < 1.0:
            raise ConfigError("dropout must be in [0, 1)")
        if not 0.0 < self.ema_rate < 1.0:
            raise ConfigError("ema_rate must be in (0, 1)")

    @property
    def unet_in_channels(self) -> int:
        """Total channels of the UNet input tensor.

        Matches the reference arithmetic (models/unet.py:212):
        cond(48) + [xt(pred) + other(45)] for the wavelet config = 96.
        """
        if self.use_other_channels:
            return self.in_channels * 2 + self.pred_channels - self.other_channels_begin
        return self.in_channels + self.pred_channels


@dataclass
class DiffusionConfig:
    beta_schedule: str = "linear"
    beta_start: float = 0.0001
    beta_end: float = 0.02
    num_diffusion_timesteps: int = 1000

    def validate(self) -> None:
        if self.beta_schedule not in ("linear", "quad", "const", "jsd", "sigmoid"):
            raise ConfigError(f"unknown beta_schedule {self.beta_schedule!r}")
        if self.num_diffusion_timesteps < 1:
            raise ConfigError("num_diffusion_timesteps must be >= 1")


@dataclass
class TrainingConfig:
    use_mse: bool = False         # optimize x0-MSE instead of eps loss
    patch_n: int = 8              # random crops per image per step
    batch_size: int = 1
    n_epochs: int = 38000
    n_iters: int = 2000000
    snapshot_freq: int = 3000
    validation_freq: int = 3000
    seed: int = 61
    # Diffusion parameterization: "eps" (the reference's only mode,
    # models/ddm_wavelet.py:108-124) or "v" (velocity; opt-in fix for the
    # measured high-t conditioning failure -- see diffusion/loss.py).  The
    # sampler must be built with the SAME pred_type the weights were
    # trained with.
    pred_type: str = "eps"
    # min-SNR-gamma loss weighting (0 = off; typical value 5.0)
    snr_gamma: float = 0.0
    # snapshot retention: keep the N most recent snapshot dirs (0 = all).
    # A flagship Orbax TrainState is ~3.1 GB; long runs need this.
    keep_snapshots: int = 0
    # gradient accumulation: split each step's crop batch into this many
    # micro-batches inside one compiled step (lax.scan) -- large effective
    # batches at ~1/A the activation memory. 1 = off.
    grad_accum: int = 1

    def validate(self) -> None:
        if self.batch_size < 1 or self.patch_n < 1:
            raise ConfigError("batch_size and patch_n must be >= 1")
        if self.pred_type not in ("eps", "v"):
            raise ConfigError("training.pred_type must be 'eps' or 'v'")
        if self.snr_gamma < 0:
            raise ConfigError("training.snr_gamma must be >= 0")
        if self.grad_accum < 1:
            raise ConfigError("training.grad_accum must be >= 1")
        if (self.batch_size * self.patch_n) % self.grad_accum:
            raise ConfigError(
                "batch_size*patch_n must be divisible by grad_accum")


@dataclass
class SamplingConfig:
    # batch_size / last_only: accepted for reference-YAML compatibility;
    # DEAD IN THE REFERENCE TOO (sampling.batch_size is never read and
    # sample_image hardcodes last=True, models/ddm_wavelet.py:296-303).
    # Batched restoration here is driven by the input's leading axis.
    batch_size: int = 1
    last_only: bool = True
    sampling_timesteps: int = 25  # DDIM steps (reference: --sampling_timesteps)
    grid_r: int = 16              # overlap grid stride (reference: --grid_r)
    eta: float = 0.0
    # Which DDIM trajectory element to use as the restored output.  The
    # reference evaluates `x0_preds[-5]` (models/restoration.py:108), i.e. the
    # x0 estimate from the 5th-from-last DDIM step -- semantically load-bearing
    # for PSNR, so it is an explicit knob here.
    x0_pred_index: int = -5
    patch_micro_batch: int = 0    # 0 = all patches in one vmapped forward
    jit_mode: str = "scan"        # "scan": whole chain one program;
                                  # "step": one program per DDIM step
    # Whole-image (non-tiled) DDIM eval: the reference's generalized_steps
    # (utils/sampling.py:23-44, reachable via sample_image(patch_locs=None)).
    # Output is the final x_t (reference last=True), not x0_preds[-5].
    # The image is reflect-padded to the UNet's divisibility requirement and
    # cropped back (the reference crashes on non-divisible sizes).
    whole_image: bool = False
    # Truncated refinement sampling (TPU-build extension; generalizes the
    # reference's `begin_from_noise: false`, models/ddm.py:361-365, which
    # noises the conditioning to t=T-1 -- at T=1000 that is indistinguishable
    # from pure noise).  t_start > 0 runs the DDIM chain only over
    # [0, t_start) (sampling_timesteps evenly-skipped steps) and initializes
    # x_{t_start} by noising `init_ll` to that level.  Motivated by a measured
    # failure mode of eps-parameterized conditional restoration: at
    # a_t ~ 1e-4 the cond-dependent part of eps contributes ~5e-4 to the
    # training loss, so models predict eps ~ x_t there and the first ~15 of
    # 25 chain steps add error instead of removing it (see README "Quality
    # loop").  0 disables (full reference chain).
    t_start: int = 0
    # What to noise to t_start: "hfrm" (stage-1 restorer's LL band -- the
    # natural refinement target), "cond" (degraded input's LL), or "noise"
    # (pure noise at a(t_start); degenerate, for ablations).
    init_ll: str = "hfrm"
    # Reverse-chain update rule: "ddim" (the reference's, utils/sampling.py:
    # 29-43) or "dpmpp2m" (DPM-Solver++(2M): second-order multistep on the
    # data prediction; same UNet evaluations per step, lower discretization
    # error at few steps).  dpmpp2m requires eta == 0.
    solver: str = "ddim"

    def validate(self) -> None:
        if self.sampling_timesteps < 1:
            raise ConfigError("sampling_timesteps must be >= 1")
        if self.grid_r < 1:
            raise ConfigError("grid_r must be >= 1")
        if self.jit_mode not in ("scan", "step"):
            raise ConfigError("jit_mode must be 'scan' or 'step'")
        if self.t_start < 0:
            raise ConfigError("t_start must be >= 0 (0 disables truncation)")
        if self.init_ll not in ("hfrm", "cond", "noise"):
            raise ConfigError("init_ll must be 'hfrm', 'cond', or 'noise'")
        if self.solver not in ("ddim", "dpmpp2m"):
            raise ConfigError("solver must be 'ddim' or 'dpmpp2m'")
        if self.solver == "dpmpp2m" and self.eta > 0:
            raise ConfigError("dpmpp2m is deterministic: eta must be 0")


@dataclass
class OptimConfig:
    optimizer: str = "Adam"
    lr: float = 0.00004
    weight_decay: float = 0.0
    beta1: float = 0.9
    beta2: float = 0.999
    amsgrad: bool = False
    eps: float = 1e-8

    def validate(self) -> None:
        if self.optimizer not in ("Adam", "RMSProp", "SGD"):
            raise ConfigError(f"unknown optimizer {self.optimizer!r}")


@dataclass
class ParallelConfig:
    """TPU mesh layout. The reference's only parallelism is NCCL DDP
    (train_diffusion.py:80, models/ddm_wavelet.py:168); here data parallelism
    rides a named mesh axis and parameters may additionally be sharded
    FSDP-style along the same axis."""
    data_axis: int = -1           # -1: use all devices on the data axis
    fsdp: bool = False            # shard params/opt-state over the data axis
    compute_dtype: str = "float32"   # bfloat16 | float32 for activations
    # Pallas one-pass GroupNorm(+swish) kernel in the UNet (identical param
    # tree; ops/groupnorm_pallas.py).  Trace analysis shows GN stat reduces
    # cost ~25% of the DDIM chain, BUT the isolated kernel measured 0.74x
    # the XLA path on v5e: the custom call breaks XLA's producer/consumer
    # fusion at all ~30 norm sites, adding more HBM round-trips than the
    # one-pass kernel saves.  Kept for experimentation; default off.
    fused_groupnorm: bool = False
    # Pallas fused GroupNorm->swish->conv3x3 for the ResnetBlock pairs
    # (ops/fused_resblock.py): moves the fusion boundary PAST the conv so
    # each norm site costs one HBM read+write instead of XLA's extra
    # standalone statistics read (the ~25% trace item).  Identical param
    # tree to the unfused path.  r3 second attack on the GN cost; measure
    # with bench.py before enabling in production.
    fused_resblock: bool = False

    def validate(self) -> None:
        if self.compute_dtype not in ("float32", "bfloat16"):
            raise ConfigError("compute_dtype must be float32 or bfloat16")
        if self.fused_groupnorm and self.fused_resblock:
            raise ConfigError(
                "fused_groupnorm and fused_resblock are alternative GN "
                "strategies; enable at most one")


@dataclass
class HFRMConfig:
    """Stage-1 high-frequency restoration module (reference: train_hfrm.py:150-154)."""
    dim: int = 32
    enc_blk_nums: Tuple[int, ...] = (2, 2, 2, 4)
    middle_blk_num: int = 6
    dec_blk_nums: Tuple[int, ...] = (2, 2, 2, 2)
    ckpt_path: str = ""           # frozen weights for stage 2 ('' = random init)
    lr: float = 0.0002
    batch_size: int = 8
    n_epochs: int = 800
    best_psnr_init: float = 31.0  # best-checkpoint PSNR gate (train_hfrm.py:228)
    # Opt-in loss terms.  ALL DEAD in the reference (train_hfrm.py:58-141
    # defines VGG19 LossNetwork / TVLoss / GAN criterion+Discriminator
    # machinery but the shipped loss is only 2*L1*255, :259-267); provided
    # for inventory completeness as additive terms on the shipped loss.
    # jax.checkpoint each residual block (stage-1 full-image training at
    # dim 32 needs it on a 16 GB chip; see models/hfrm.py HFRM.remat)
    remat: bool = False
    use_perceptual: bool = False  # + VGG19 relu1..5 L1 (models/vgg_loss.py)
    vgg_ckpt: str = ""            # torchvision vgg19 weights (.pth); '' = random feats
    use_gan: bool = False         # + lsgan term w/ the PatchGAN Discriminator
    lambda_gan: float = 1.0       # weight on the generator's GAN term
    tv_weight: float = 0.0        # + TV regulariser (reference TVLoss)

    def __post_init__(self):
        self.enc_blk_nums = tuple(self.enc_blk_nums)
        self.dec_blk_nums = tuple(self.dec_blk_nums)

    def validate(self) -> None:
        if len(self.enc_blk_nums) != len(self.dec_blk_nums):
            raise ConfigError("enc/dec block lists must have equal depth")


@dataclass
class Config:
    data: DataConfig = field(default_factory=DataConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    diffusion: DiffusionConfig = field(default_factory=DiffusionConfig)
    training: TrainingConfig = field(default_factory=TrainingConfig)
    sampling: SamplingConfig = field(default_factory=SamplingConfig)
    optim: OptimConfig = field(default_factory=OptimConfig)
    parallel: ParallelConfig = field(default_factory=ParallelConfig)
    hfrm: HFRMConfig = field(default_factory=HFRMConfig)

    def validate(self) -> "Config":
        for f in dataclasses.fields(self):
            getattr(self, f.name).validate()
        if self.sampling.t_start >= self.diffusion.num_diffusion_timesteps:
            raise ConfigError(
                "sampling.t_start must be < diffusion.num_diffusion_timesteps")
        if (self.sampling.t_start > 0 and self.sampling.init_ll == "hfrm"
                and not (self.data.wavelet and not self.data.wavelet_in_unet)):
            raise ConfigError(
                "init_ll: hfrm requires the wavelet path (the stage-1 "
                "restorer's LL band only exists there); use init_ll: cond")
        return self


_SECTION_TYPES = {
    "data": DataConfig,
    "model": ModelConfig,
    "diffusion": DiffusionConfig,
    "training": TrainingConfig,
    "sampling": SamplingConfig,
    "optim": OptimConfig,
    "parallel": ParallelConfig,
    "hfrm": HFRMConfig,
}

# Reference-YAML keys accepted-and-ignored for drop-in compatibility.
_IGNORED_KEYS: set = set()


def _build_section(cls, name: str, raw: dict):
    field_names = {f.name for f in dataclasses.fields(cls)}
    kwargs = {}
    for key, value in raw.items():
        if key in field_names:
            kwargs[key] = value
        elif (name, key) in _IGNORED_KEYS:
            continue
        else:
            raise ConfigError(f"unknown key '{name}.{key}' in config")
    return cls(**kwargs)


def config_from_dict(raw: dict) -> Config:
    sections = {}
    for name, value in raw.items():
        if name not in _SECTION_TYPES:
            raise ConfigError(f"unknown config section '{name}'")
        if not isinstance(value, dict):
            raise ConfigError(f"section '{name}' must be a mapping")
        sections[name] = _build_section(_SECTION_TYPES[name], name, value)
    return Config(**sections).validate()


def apply_overrides(raw: dict, overrides) -> dict:
    """Apply ``section.key=value`` strings (values YAML-parsed) to a raw
    config mapping.  Unknown sections/keys still fail in config_from_dict,
    so an override cannot silently miss."""
    for ov in overrides:
        key, eq, sval = ov.partition("=")
        parts = key.strip().split(".")
        if not eq or len(parts) != 2 or not sval.strip():
            raise ConfigError(
                f"override '{ov}' must look like section.key=value")
        sec, k = parts
        if not isinstance(raw.get(sec, {}), dict):
            raise ConfigError(f"override '{ov}': section '{sec}' is not a "
                              "mapping")
        raw.setdefault(sec, {})[k] = yaml.safe_load(sval)
    return raw


def load_config(path: str, overrides=()) -> Config:
    """Load and validate a YAML config file.

    ``overrides`` are ``section.key=value`` strings (CLI ``--set``) applied
    on top of the file before validation.
    """
    with open(path, "r") as f:
        raw = yaml.safe_load(f)
    if not isinstance(raw, dict):
        raise ConfigError(f"config file {path} did not parse to a mapping")
    if overrides:
        raw = apply_overrides(raw, overrides)
    return config_from_dict(raw)


def config_to_dict(cfg: Config) -> dict:
    return dataclasses.asdict(cfg)
