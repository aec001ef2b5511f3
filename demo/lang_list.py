"""Language name tables for the web demos (reference demo/m4tv2/lang_list.py).

The reference hard-codes per-task language-code lists; here the task lists are
DERIVED from the asset cards at runtime (`task_language_names`) so a demo built
on a different card (e.g. a tiny local test model) automatically offers exactly
the languages that model supports. Only the code -> display-name map is static
data (public ISO 639-3 names).
"""

from __future__ import annotations

from typing import Dict, List

LANGUAGE_CODE_TO_NAME: Dict[str, str] = {
    "afr": "Afrikaans", "amh": "Amharic", "arb": "Modern Standard Arabic",
    "ary": "Moroccan Arabic", "arz": "Egyptian Arabic", "asm": "Assamese",
    "ast": "Asturian", "azj": "North Azerbaijani", "bel": "Belarusian",
    "ben": "Bengali", "bos": "Bosnian", "bul": "Bulgarian", "cat": "Catalan",
    "ceb": "Cebuano", "ces": "Czech", "ckb": "Central Kurdish",
    "cmn": "Mandarin Chinese", "cym": "Welsh", "dan": "Danish",
    "deu": "German", "ell": "Greek", "eng": "English", "est": "Estonian",
    "eus": "Basque", "fin": "Finnish", "fra": "French",
    "gaz": "West Central Oromo", "gle": "Irish", "glg": "Galician",
    "guj": "Gujarati", "heb": "Hebrew", "hin": "Hindi", "hrv": "Croatian",
    "hun": "Hungarian", "hye": "Armenian", "ibo": "Igbo",
    "ind": "Indonesian", "isl": "Icelandic", "ita": "Italian",
    "jav": "Javanese", "jpn": "Japanese", "kam": "Kamba", "kan": "Kannada",
    "kat": "Georgian", "kaz": "Kazakh", "kea": "Kabuverdianu",
    "khk": "Halh Mongolian", "khm": "Khmer", "kir": "Kyrgyz",
    "kor": "Korean", "lao": "Lao", "lit": "Lithuanian",
    "ltz": "Luxembourgish", "lug": "Ganda", "luo": "Luo",
    "lvs": "Standard Latvian", "mai": "Maithili", "mal": "Malayalam",
    "mar": "Marathi", "mkd": "Macedonian", "mlt": "Maltese",
    "mni": "Meitei", "mya": "Burmese", "nld": "Dutch",
    "nno": "Norwegian Nynorsk", "nob": "Norwegian Bokmål",
    "npi": "Nepali", "nya": "Nyanja", "oci": "Occitan", "ory": "Odia",
    "pan": "Punjabi", "pbt": "Southern Pashto", "pes": "Western Persian",
    "pol": "Polish", "por": "Portuguese", "ron": "Romanian",
    "rus": "Russian", "slk": "Slovak", "slv": "Slovenian", "sna": "Shona",
    "snd": "Sindhi", "som": "Somali", "spa": "Spanish", "srp": "Serbian",
    "swe": "Swedish", "swh": "Swahili", "tam": "Tamil", "tel": "Telugu",
    "tgk": "Tajik", "tgl": "Tagalog", "tha": "Thai", "tur": "Turkish",
    "ukr": "Ukrainian", "urd": "Urdu", "uzn": "Northern Uzbek",
    "vie": "Vietnamese", "xho": "Xhosa", "yor": "Yoruba",
    "yue": "Cantonese", "zlm": "Colloquial Malay", "zsm": "Standard Malay",
    "zul": "Zulu",
}

LANGUAGE_NAME_TO_CODE: Dict[str, str] = {
    v: k for k, v in LANGUAGE_CODE_TO_NAME.items()}


def _names(codes) -> List[str]:
    return sorted(LANGUAGE_CODE_TO_NAME.get(c, c) for c in codes)


def task_language_names(model_card: dict) -> Dict[str, List[str]]:
    """Per-task language-name lists from an asset card.

    Text source/target languages come from the card's ``langs`` (the NLLB text
    vocabulary); speech-output target languages from ``unit_langs`` (the
    vocoder-supported subset) — the same split the reference's hard-coded
    lists encode (demo/m4tv2/lang_list.py:105-255).
    """
    text = [l.strip("_") for l in model_card.get("langs", [])]
    speech_tgt = model_card.get("unit_langs", []) or text
    return {
        "text_source": _names(text),
        "s2st_target": _names(speech_tgt),
        "t2st_target": _names(speech_tgt),
        "s2tt_target": _names(text),
        "t2tt_target": _names(text),
        "asr_target": _names(text),
    }
