"""SD3Pipeline — the user-facing front door for SD3 Natural Inference.

The reference drives everything through diffusers'
``StableDiffusion3Pipeline`` (``src/SD3NaturalInference.py:175-243``):
encode_prompt -> 28 transformer steps -> VAE decode.  This is that surface
on the TPU-native stack: the three Flax text encoders, the MMDiT, the NI
engine (ONE jitted executable per (steps, weights) configuration) and the
VAE, assembled from converted HF weights or random init (smoke mode).

    pipe = SD3Pipeline.from_parts(mmdit=..., params=..., vae=..., ...)
    images = pipe(prompt="a photo of a cat", noises=z, num_steps=28,
                  weights=sharp_csv_matrix)

Conditioning enters at any stage: raw text (in-repo CLIP BPE + T5
sentencepiece tokenizers, given vocab assets), precomputed token ids, or
precomputed embeddings.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from .coeffs.sd3 import sd3_weight_matrix, sd3_euler_weights
from .engine import NISchedule, natural_inference


@dataclasses.dataclass
class SD3Pipeline:
    """Assembled SD3 stack.  Every part optional except the transformer:
    without text encoders pass embeddings; without a VAE latents return."""

    mmdit: Any
    mmdit_params: Any
    vae: Any = None
    vae_params: Any = None
    clip_l: Any = None
    clip_l_params: Any = None
    clip_g: Any = None
    clip_g_params: Any = None
    t5: Any = None
    t5_params: Any = None
    tokenizer_clip: Any = None     # text.CLIPBPETokenizer (shared L/G vocab)
    tokenizer_t5: Any = None       # text.SentencePieceUnigram
    cfg_scale: float = 7.0
    shift: float = 3.0

    @classmethod
    def from_parts(cls, **kw) -> "SD3Pipeline":
        return cls(**kw)

    # -- conditioning -------------------------------------------------------

    def tokenize(self, prompt, negative_prompt="", t5_length: int = 256):
        """Raw text -> the ids dict (``text.sd3_tokenize_ids``).  Requires
        ``tokenizer_clip`` (built from vocab.json/merges.txt) and optionally
        ``tokenizer_t5`` (spiece.model).  The CLIP row length follows the
        encoder's position table (77 for real SD3)."""
        from .text import sd3_tokenize_ids
        if self.tokenizer_clip is None:
            raise ValueError("pipeline has no tokenizer; pass ids or embeds")
        clip_length = getattr(getattr(self.clip_l, "config", None),
                              "max_positions", 77) if self.clip_l else 77
        return sd3_tokenize_ids(prompt, negative_prompt,
                                clip_l=self.tokenizer_clip,
                                t5=self.tokenizer_t5,
                                clip_length=clip_length,
                                t5_length=t5_length)

    def encode_prompt(self, ids_l, ids_g, ids_t5=None):
        """Token ids -> (prompt_embeds, pooled) via the Flax encoders."""
        from .models.text_encoders import sd3_encode_prompt
        if self.clip_l is None or self.clip_g is None:
            raise ValueError("pipeline has no text encoders; pass embeds")
        return sd3_encode_prompt(
            self.clip_l, self.clip_l_params, ids_l,
            self.clip_g, self.clip_g_params, ids_g,
            self.t5, self.t5_params, ids_t5,
            joint_dim=self.mmdit.config.joint_attention_dim)

    # -- sampling -----------------------------------------------------------

    def _get_run(self, num_steps: int):
        """One jitted executable per step count, cached on the pipeline.
        Params/schedule/conditioning all enter as jit ARGUMENTS (closing
        over 2B params bakes ~4GB of constants into the executable), and
        the engine takes the scan path (28 unrolled transformer copies is
        an unreasonable XLA graph at SD3 scale)."""
        cache = self.__dict__.setdefault("_run_cache", {})
        if num_steps in cache:
            return cache[num_steps]
        model = self.mmdit
        cfg_scale = self.cfg_scale

        def run(params, sched, z, ctx2, pool2):
            # the schedule is static -> all timestep embeddings + adaLN
            # modulations are loop constants, precomputed in one full-MXU
            # pass and scanned in via the engine's step_inputs hook
            from .models.mmdit import mmdit_cfg_fwd_mods
            fwd, step_inputs = mmdit_cfg_fwd_mods(
                model, params, ctx2=ctx2, pool2=pool2,
                t_all=sched.node[:num_steps, 0], cfg_scale=cfg_scale)
            return natural_inference(fwd, sched, z,
                                     prediction_type="v_flow",
                                     unroll=False, step_inputs=step_inputs)

        cache[num_steps] = jax.jit(run)
        return cache[num_steps]

    def __call__(self, *, noises, context=None, pooled=None,
                 neg_context=None, neg_pooled=None,
                 prompt=None, negative_prompt="",
                 num_steps: int = 28, weights: np.ndarray | None = None,
                 decode: bool = True, key=None):
        """Run Natural Inference; ``weights`` defaults to the vanilla-Euler
        matrix (exact Euler sampling); pass the learned/sharp CSV matrices
        for sharpness control.  Conditioning: either the four embedding
        tensors, or ``prompt=``/``negative_prompt=`` raw text (tokenized +
        encoded in-repo).  Returns decoded images (VAE present and
        ``decode``) or latents."""
        if prompt is not None:
            ids = self.tokenize(prompt, negative_prompt)
            context, pooled = self.encode_prompt(
                ids["ids_l"], ids["ids_g"], ids.get("ids_t5"))
            neg_context, neg_pooled = self.encode_prompt(
                ids["neg_ids_l"], ids["neg_ids_g"], ids.get("neg_ids_t5"))
        if context is None or pooled is None \
                or neg_context is None or neg_pooled is None:
            raise ValueError("pass prompt= or the four embedding tensors")
        if weights is None:
            weights = sd3_euler_weights(num_steps, shift=self.shift)
        sched = NISchedule.from_matrix(
            sd3_weight_matrix(weights, num_steps, shift=self.shift))

        ctx2 = jnp.concatenate([context, neg_context], axis=0)
        pool2 = jnp.concatenate([pooled, neg_pooled], axis=0)
        run = self._get_run(num_steps)
        latents = run(self.mmdit_params, sched, noises, ctx2, pool2)

        if decode and self.vae is not None:
            from .models.vae import AutoencoderKL
            return self.vae.apply(
                {"params": self.vae_params},
                self.vae.unscale_latents(latents),
                method=AutoencoderKL.decode)
        return latents
