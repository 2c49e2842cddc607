"""The results-tree path schema as typed keys (replaces glob-as-discovery).

Reference parity: the reference's dataflow bus is a deterministic directory
schema discovered by glob (SURVEY.md §1 L— row; e.g.
``results/generation/human_sample/{sc}/{cat}/{asset}/{view}/{mask}/{prompt}/{inpaint}.pickle``,
``src/generation/inpaint.py:235-236``, ``src/coma/extract_coma.py:148-260``).
We keep the exact on-disk schema (artifact compatibility: reference-produced
trees load unchanged) but front it with typed keys and sorted discovery so
work lists are deterministic and shardable.

Path-string convention: '/' inside supercategory/category is flattened to ':'
(reference: ``extract_coma.py:42-43,153-154``).
"""
from __future__ import annotations

import dataclasses
import glob as _glob
import os
from typing import Iterator, List, Optional, Tuple


def flatten(name: str) -> str:
    return name.replace("/", ":")


def unflatten(name: str) -> str:
    return name.replace(":", "/")


def mainprompt_of(prompt: str) -> str:
    """First comma field; 'total:'-prefixed prompts group under 'total'
    (reference: ``extract_coma.py:156``)."""
    head = prompt.split(",")[0]
    return "total" if "total:" in head else head


@dataclasses.dataclass(frozen=True, order=True)
class SampleKey:
    """Identity of one HOI work item (one inpainted image and its lineage)."""

    supercategory: str
    category: str
    asset_id: str
    view_id: str
    asset_mask_id: str
    prompt: str
    inpaint_id: str

    @property
    def mainprompt(self) -> str:
        return mainprompt_of(self.prompt)

    @property
    def scam(self) -> Tuple[str, str, str, str]:
        return (self.supercategory, self.category, self.asset_id, self.mainprompt)


def scam_of(key: SampleKey) -> Tuple[str, str, str, str]:
    return key.scam


@dataclasses.dataclass(frozen=True)
class ResultsTree:
    """Typed accessors over the reference's results/ directory schema."""

    root: str = "results"

    # --- generation stage ---
    def render_png(self, sc, cat, asset, view) -> str:
        return f"{self.root}/generation/renders/{flatten(sc)}/{flatten(cat)}/{asset}/{view}.png"

    def camera(self, sc, cat, asset, view) -> str:
        return f"{self.root}/generation/cameras/{flatten(sc)}/{flatten(cat)}/{asset}/{view}.pickle"

    def inpaint_png(self, k: SampleKey) -> str:
        return (
            f"{self.root}/generation/inpaintings/{flatten(k.supercategory)}/{flatten(k.category)}/"
            f"{k.asset_id}/{k.view_id}/{k.asset_mask_id}/{k.prompt}/{k.inpaint_id}.png"
        )

    def human_pred(self, k: SampleKey) -> str:
        return (
            f"{self.root}/generation/human_preds/{flatten(k.supercategory)}/{flatten(k.category)}/"
            f"{k.asset_id}/{k.view_id}/{k.asset_mask_id}/{k.mainprompt}/{k.inpaint_id}.pickle"
        )

    def human_sample(self, k: SampleKey) -> str:
        return (
            f"{self.root}/generation/human_sample/{flatten(k.supercategory)}/{flatten(k.category)}/"
            f"{k.asset_id}/{k.view_id}/{k.asset_mask_id}/{k.prompt}/{k.inpaint_id}.pickle"
        )

    # --- coma stage ---
    def asset_downsample(self, sc, cat, asset, res) -> str:
        return f"{self.root}/coma/asset_downsample/{flatten(sc)}/{flatten(cat)}/{asset}_{res}.pickle"

    def asset_obj(self, sc, cat, asset) -> str:
        return f"{self.root}/coma/asset_downsample/{flatten(sc)}/{flatten(cat)}/{asset}.obj"

    def postfilter_json(self, sc, cat, asset, mainprompt) -> str:
        return f"{self.root}/coma/human_postfilterings/{flatten(sc)}/{flatten(cat)}/{asset}/{mainprompt}.json"

    def coma_pickle(self, sc, cat, asset, hyperparams_key, mainprompt) -> str:
        return (
            f"{self.root}/coma/extracted_coma/{flatten(sc)}/{flatten(cat)}/{asset}/"
            f"{hyperparams_key}:{mainprompt}.pickle"
        )

    def coma_json(self, sc, cat, asset, hyperparams_key, mainprompt) -> str:
        return (
            f"{self.root}/coma/extracted_coma/{flatten(sc)}/{flatten(cat)}/{asset}/"
            f"{hyperparams_key}:{mainprompt}.json"
        )

    def affordance_dir(self, sc, cat, asset, hyperparams_key, mainprompt) -> str:
        # NOTE: reference uses the *unflattened* names here (extract_coma.py:435).
        return f"{self.root}/coma/affordance/{sc}/{cat}/{asset}/{hyperparams_key}:{mainprompt}"

    # --- discovery ---
    def parse_human_sample_path(self, path: str) -> SampleKey:
        sc_str, cat_str, asset, view, mask, prompt, fname = path.split("/")[-7:]
        inpaint_id = fname.rsplit(".", 1)[0]
        return SampleKey(
            supercategory=unflatten(sc_str),
            category=unflatten(cat_str),
            asset_id=asset,
            view_id=view,
            asset_mask_id=mask,
            prompt=prompt,
            inpaint_id=inpaint_id,
        )

    def iter_human_samples(
        self,
        supercategories: Optional[List[str]] = None,
        categories: Optional[List[str]] = None,
        prompts: Optional[List[str]] = None,
    ) -> Iterator[Tuple[SampleKey, str]]:
        """Deterministic (sorted) discovery of finalized HOI samples with the
        reference's lowercased filter semantics (``extract_coma.py:157-167``)."""
        pattern = f"{self.root}/generation/human_sample/*/*/*/*/*/*/*.pickle"
        for path in sorted(set(_glob.glob(pattern))):
            key = self.parse_human_sample_path(path)
            if supercategories and key.supercategory.lower() not in supercategories:
                continue
            if categories and key.category.lower() not in categories:
                continue
            if prompts and key.mainprompt.lower() not in prompts:
                continue
            yield key, path


def smplx_downsample_path(res: str, constants_dir: str = "./constants/mesh") -> str:
    """Reference: ``extract_coma.py:123`` — the shipped human downsample pickles."""
    return f"{constants_dir}/smplx_star_downsampled_{res}.pickle"


def ensure_parent(path: str) -> str:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    return path
