"""Asset-card store (reference: fairseq2 asset system + store.py:12-32 gated overlay).

Cards are YAML files in ``seamless_communication_tpu/cards/`` with ``base:``
inheritance; fields carry checkpoint/tokenizer URLs, arch names, language lists and
the vocoder ``lang_spkr_idx_map``. Gated assets (expressivity, pretssel) resolve
through the ``SEAMLESS_GATED_ASSETS`` env var pointing at a local directory
(reference store.py ``add_gated_assets``).
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Any, Dict, Optional

import yaml

CARDS_DIR = Path(__file__).parent / "cards"
# card name -> file name inside the gated dir, matching the reference's
# add_gated_assets layout (store.py:17-30) so a user's --gated-model-dir
# drops in unchanged; <card>.pt also accepted
_GATED = {"seamless_expressivity": "m2m_expressive_unity.pt",
          "vocoder_pretssel": "pretssel_melhifigan_wm.pt",
          "vocoder_pretssel_16khz": "pretssel_melhifigan_wm-16khz.pt"}


def load_card(name: str, *, cards_dir: Optional[Path] = None) -> Dict[str, Any]:
    """Load a card by name, resolving ``base:`` inheritance (child wins).

    Custom cards: set ``SEAMLESS_CARDS_DIR`` to a directory of extra .yaml
    cards — it is searched first, falling back to the packaged cards (so user
    cards can still inherit from packaged ones via ``base:``)."""
    if cards_dir is None:
        user_dir = os.environ.get("SEAMLESS_CARDS_DIR")
        if user_dir and (Path(user_dir) / f"{name}.yaml").exists():
            cards_dir = Path(user_dir)
        else:
            cards_dir = CARDS_DIR
    path = cards_dir / f"{name}.yaml"
    if not path.exists():
        raise FileNotFoundError(f"no asset card {name!r} in {cards_dir}")
    with open(path) as f:
        card = yaml.safe_load(f)
    if "base" in card:
        # resolve the base by name again (user dir first, then packaged) so
        # custom cards can inherit from packaged ones
        base = load_card(card["base"])
        merged = dict(base)
        merged.update({k: v for k, v in card.items() if k != "base"})
        card = merged
    gated_dir = os.environ.get("SEAMLESS_GATED_ASSETS")
    if name in _GATED and gated_dir:
        for fname in (_GATED[name], f"{name}.pt"):
            local = Path(gated_dir) / fname
            if local.exists():
                card["checkpoint"] = str(local)
                break
    return card


def list_cards() -> list:
    return sorted(p.stem for p in CARDS_DIR.glob("*.yaml"))


def resolve_asset(url_or_path: str, *, cache_dir: Optional[str] = None) -> str:
    """Resolve an asset reference to a local path. Local paths pass through;
    URLs map into the cache dir (download if the environment has egress)."""
    if os.path.exists(url_or_path):
        return url_or_path
    cache_dir = cache_dir or os.environ.get(
        "SEAMLESS_CACHE", os.path.expanduser("~/.cache/seamless_tpu"))
    fname = url_or_path.rstrip("/").split("/")[-1]
    local = os.path.join(cache_dir, fname)
    if os.path.exists(local):
        return local
    # zero-egress environments must pre-populate the cache
    try:
        import urllib.request
        os.makedirs(cache_dir, exist_ok=True)
        urllib.request.urlretrieve(url_or_path, local)  # noqa: S310
        return local
    except Exception as e:  # pragma: no cover
        raise FileNotFoundError(
            f"asset {url_or_path!r} not cached at {local} and not downloadable: {e}")
