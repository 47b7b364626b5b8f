"""naturaldiffusion_tpu — a TPU-native Natural-Inference diffusion framework.

Every mainstream diffusion sampler (DDPM ancestral, DDIM, SDE/ODE Euler, Heun,
DPM-Solver/++ 2s/3s, DEIS, flow-matching Euler) expressed as a pair of
lower-triangular coefficient matrices over past denoiser outputs and injected
noises, executed by one jitted ``lax.scan`` engine with Pallas kernels on the
hot path.  See SURVEY.md for the map to the reference implementation.
"""

__version__ = "0.1.0"
