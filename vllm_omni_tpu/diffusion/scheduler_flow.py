"""Flow-match Euler scheduler.

Reference parity: diffusion/models/schedulers/ (flow-match family, 799
LoC). Host-side pure numpy — sigmas are tiny and the denoise loop control
lives on host (device code is one fixed-shape step, SURVEY.md §7 hard
parts: per-request step state host-side).

Convention (Flux/SD3 flow matching): sigma ∈ (0, 1], x_sigma =
(1-sigma)·x0 + sigma·noise; the model predicts velocity v = noise - x0;
Euler step x_{σ'} = x_σ + (σ' - σ)·v.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


def time_shift(shift: float, sigmas: np.ndarray) -> np.ndarray:
    """Static resolution-independent shift: σ → s·σ / (1 + (s-1)·σ)."""
    return shift * sigmas / (1.0 + (shift - 1.0) * sigmas)


def dynamic_shift_for_seq_len(seq_len: int, base_len: int = 256,
                              max_len: int = 4096, base_shift: float = 0.5,
                              max_shift: float = 1.15) -> float:
    """Resolution-dependent shift (Flux `calculate_shift`): longer image
    token sequences get more high-noise steps."""
    m = (max_shift - base_shift) / (max_len - base_len)
    b = base_shift - m * base_len
    return float(np.exp(m * seq_len + b))


@dataclass
class FlowMatchEulerScheduler:
    num_train_timesteps: int = 1000
    shift: float = 3.0
    use_dynamic_shifting: bool = False

    def sigmas_for(self, num_steps: int,
                   image_seq_len: int = 0) -> np.ndarray:
        """Decreasing sigma schedule with a trailing 0 (length
        num_steps+1)."""
        sigmas = np.linspace(1.0, 1.0 / num_steps, num_steps,
                             dtype=np.float64)
        if self.use_dynamic_shifting and image_seq_len > 0:
            mu = dynamic_shift_for_seq_len(image_seq_len)
            sigmas = mu * sigmas / (1.0 + (mu - 1.0) * sigmas)
        else:
            sigmas = time_shift(self.shift, sigmas)
        return np.append(sigmas, 0.0).astype(np.float32)

    def timesteps_for(self, sigmas: np.ndarray) -> np.ndarray:
        """Timesteps fed to the model = σ·T (diffusers convention)."""
        return (sigmas[:-1] * self.num_train_timesteps).astype(np.float32)

    @staticmethod
    def scale_noise(x0, noise, sigma):
        """Forward process at σ (used by img2img/inpaint entry)."""
        return (1.0 - sigma) * x0 + sigma * noise

    @staticmethod
    def step(latents, velocity, sigma: float, sigma_next: float):
        """One Euler integration step (pure function; called inside the
        jitted denoise step with python-float sigmas baked per bucket or
        passed as scalars)."""
        return latents + (sigma_next - sigma) * velocity
