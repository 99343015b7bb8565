"""High-level generation driver.

TPU re-design of the reference Sampler (reference: tools/sampler.py:97-268):
one jitted program per (sampler-kind, batch shape) generates a full batch —
the denoising loop is a scan inside the jit, CFG doubles the batch inside the
loop body, and the VAE decode + uint8 conversion fuse into the same program.
The reference's rank-0 EMA broadcast + all_gather collection
(sampler.py:122-124, 232-247) disappear under SPMD: EMA params are already
consistent, and host collection is a device_get of the sharded output.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .edm import ablation_sampler, build_edm_plan
from .guidance import IntervalCFG, cfg_scale_for_time, classifier_cond_fn

__all__ = ["Sampler"]


def _inverse_normalize(x):
    """[-1,1] float -> uint8 (reference: tools/sampler.py:257-258); NHWC
    already, no permute needed."""
    return jnp.clip((x + 1) * 127.5, 0, 255).astype(jnp.uint8)


class Sampler:
    """Generation driver over an EMA model closure.

    model_fn(x, t, y=...) -> model output (primary or (primary, aux)).
    vae_decode_fn: optional latents -> images in [-1,1] (NHWC), applied when
    in_chans == 4 (reference: tools/sampler.py:249-255).
    classifier_fn: optional (x, t) -> logits for classifier guidance.
    """

    def __init__(self, cfg, model_fn, diffusion=None, vae_decode_fn=None,
                 classifier_fn=None, params=None):
        """With `params`, model_fn must take (params, x, t, **kw) and the
        weights flow through the jitted programs as ARGUMENTS — a plain
        (x, t) closure embeds them as constants in the compiled program,
        which bloats serialized HLO (a DiT-B sampler ships ~500MB of weight
        literals to any AOT/remote compiler)."""
        self.cfg = cfg
        self.diffusion = diffusion
        self.vae_decode_fn = vae_decode_fn
        self.classifier_fn = classifier_fn
        # Classifier weights ride the jits as an ARGUMENT (like the model
        # params) — closing over them would constant-fold the EncoderUNet
        # into every traced program (samplers/classifier.ClassifierFn).
        self._cparams = getattr(classifier_fn, "params", None)
        if classifier_fn is not None and not (
                cfg.model_mode == "diffusion" and cfg.solver == "ddim"):
            # Classifier gradient guidance exists only on the DDIM/ancestral
            # path (reference: cond_fn plumbed into the diffusion loops,
            # gaussian_diffusion.py:422-459; the EDM/flow samplers have no
            # classifier hook). Dropping it silently would return unguided
            # samples the user believes are guided.
            raise ValueError(
                "--use_classifier requires --model_mode diffusion "
                f"--solver ddim (got model_mode={cfg.model_mode!r}, "
                f"solver={cfg.solver!r})"
            )
        if classifier_fn is not None and not cfg.class_cond:
            # The classifier guides toward the sampled labels y; without
            # class_cond no labels are drawn and the cond_fn receives
            # y=None (the reference crashes identically — its cond_fn
            # asserts y, sampler.py:82-96 with _get_y_cond returning None).
            raise ValueError(
                "--use_classifier requires --class_cond True: the "
                "classifier needs target labels to guide toward")
        self.params = params
        if params is None:
            self._apply = lambda p, x, t, **kw: model_fn(x, t, **kw)
        else:
            self._apply = model_fn
        self._jit_cache = {}

    def _bind(self, params):
        """(x, t, **kw) callable with `params` bound; plus its CFG wrapper."""
        def model(x, t, **kw):
            return self._apply(params, x, t, **kw)

        cfg_model = IntervalCFG(
            model, self.cfg.num_classes, self.cfg.guidance_scale,
            tuple(self.cfg.interval), self.cfg.class_cond,
        )
        return model, cfg_model

    # ------------------------------------------------------------- #
    # label sampling (reference: tools/sampler.py:216-229)
    # ------------------------------------------------------------- #

    def _get_y_cond(self, rng, sample_size, num_classes):
        if not self.cfg.class_cond:
            return None
        labels = self.cfg.class_labels
        if labels is None:
            return jax.random.randint(rng, (sample_size,), 0, num_classes)
        labels = jnp.asarray(labels, jnp.int32)
        idx = jax.random.randint(rng, (sample_size,), 0, len(labels))
        return labels[idx]

    # ------------------------------------------------------------- #
    # per-batch jitted programs
    # ------------------------------------------------------------- #

    def _decode(self, samples):
        if self.cfg.in_chans == 4 and self.vae_decode_fn is not None:
            samples = self.vae_decode_fn(samples / self.cfg.latent_scale)
        return _inverse_normalize(samples)

    def _ddim_batch(self, params, cparams, rng, shape, y):
        """(reference: tools/sampler.py:117-149)"""
        raw_model, cfg_model = self._bind(params)
        cond_fn = None
        model = cfg_model
        if self.classifier_fn is not None:
            model = raw_model
            apply = getattr(self.classifier_fn, "apply_fn", None)
            fn = ((lambda x, t: apply(cparams, x, t)) if apply is not None
                  else self.classifier_fn)
            cond_fn = classifier_cond_fn(fn, self.cfg.guidance_scale)
        model_kwargs = {"y": y} if self.cfg.class_cond else {}
        samples = self.diffusion.ddim_sample_loop(
            lambda x, t, **kw: model(x, t, **kw),
            rng, shape, cond_fn=cond_fn, model_kwargs=model_kwargs,
        )
        return self._decode(samples)

    def _edm_batch(self, params, cparams, rng, shape, y, plan, g_steps):
        """(reference: tools/sampler.py:151-188)"""
        _, cfg_model = self._bind(params)
        latents = jax.random.normal(jax.random.fold_in(rng, 0), shape)
        samples = ablation_sampler(
            cfg_model, jax.random.fold_in(rng, 1), latents, plan,
            class_labels=y, guidance_scales=g_steps,
            img_channels=self.cfg.in_chans,
        )
        return self._decode(samples)

    def _flow_batch(self, params, cparams, rng, shape, y):
        """(reference: tools/sampler.py:190-214)"""
        _, cfg_model = self._bind(params)
        noise = jax.random.normal(jax.random.fold_in(rng, 0), shape)
        model_kwargs = {"y": y} if self.cfg.class_cond else {}
        samples = self.diffusion.sample(
            lambda x, t, **kw: cfg_model(x, t, **kw),
            jax.random.fold_in(rng, 1), noise,
            num_steps=self.cfg.sample_steps, solver=self.cfg.solver,
            model_kwargs=model_kwargs,
            rtol=self.cfg.rtol, atol=self.cfg.atol,
        )
        return self._decode(samples)

    # ------------------------------------------------------------- #
    # public API (reference: tools/sampler.py:260-268)
    # ------------------------------------------------------------- #

    def sample(self, rng, num_samples, sample_size, image_size, num_classes,
               progress_bar=False) -> Tuple[np.ndarray, Optional[np.ndarray]]:
        cfg = self.cfg
        shape = (sample_size, image_size, image_size, cfg.in_chans)

        # One jit wrapper per (mode, solver, steps) for the Sampler's
        # lifetime: rebuilding jax.jit per sample() call would re-trace the
        # whole denoising program every batch (seconds of host overhead).
        cache_key = (cfg.model_mode, cfg.solver, cfg.sample_steps)
        jitted = self._jit_cache.get(cache_key)
        if jitted is None:
            if cfg.model_mode == "flow":
                batch_fn = self._flow_batch
            elif cfg.model_mode == "diffusion":
                if cfg.solver == "ddim":
                    batch_fn = self._ddim_batch
                else:
                    plan = build_edm_plan(
                        num_steps=cfg.sample_steps, solver=cfg.solver,
                        discretization=cfg.discretization,
                        schedule=cfg.schedule,
                        scaling=cfg.scaling, noise_schedule=cfg.path_type,
                        pred_type=cfg.mean_type,
                    )
                    g_steps = np.array([
                        cfg_scale_for_time(t, cfg.guidance_scale,
                                           tuple(cfg.interval))
                        for t in plan.c_noise_hat
                    ])
                    batch_fn = functools.partial(
                        self._edm_batch, plan=plan, g_steps=g_steps
                    )
            else:
                raise ValueError(
                    f"Unsupported model_mode: {cfg.model_mode}"
                )
            jitted = jax.jit(batch_fn, static_argnums=(3,))
            self._jit_cache[cache_key] = jitted
        all_samples: List[np.ndarray] = []
        all_labels: List[np.ndarray] = []
        produced = 0
        batch_idx = 0
        pbar = None
        if progress_bar:
            from tqdm import tqdm

            pbar = tqdm(total=num_samples, desc=f"Sampling ({cfg.solver})")
        while produced < num_samples:
            bk = jax.random.fold_in(rng, batch_idx)
            y = self._get_y_cond(jax.random.fold_in(bk, 7), sample_size,
                                 num_classes)
            out = jitted(self.params, self._cparams, bk, shape, y)
            all_samples.append(np.asarray(out))
            if cfg.class_cond:
                all_labels.append(np.asarray(y))
            produced += sample_size
            batch_idx += 1
            if pbar is not None:
                pbar.update(sample_size)
        if pbar is not None:
            pbar.close()
        samples = np.concatenate(all_samples, axis=0)[:num_samples]
        labels = (
            np.concatenate(all_labels, axis=0)[:num_samples]
            if cfg.class_cond else None
        )
        return samples, labels
