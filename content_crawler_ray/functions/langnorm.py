"""Language normalization to ISO 639-3 — the reference's full-table lookup
(M/ElasticSearchIndexHandler.java:470-485): an input language string matches
by 2-letter code, 3-letter code, English name or native name
(case-insensitive), with UNKNOWN fallback.

The dimension table below is a curated subset of the public ISO 639
assignment (codes + reference names; the full registry is ~7,900 rows and
ships as a data file in production — swapping it in changes no call sites).
Broadcast pattern: the lookup dict is built once per worker process at import
and costs ~10 KB; no shuffle is ever keyed on language.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

UNKNOWN = "und"

# (iso639-1, iso639-3, english name, native name)
ISO639: list[tuple[str, str, str, str]] = [
    ("ab", "abk", "Abkhazian", "аҧсуа"),
    ("af", "afr", "Afrikaans", "Afrikaans"),
    ("am", "amh", "Amharic", "አማርኛ"),
    ("ar", "ara", "Arabic", "العربية"),
    ("az", "aze", "Azerbaijani", "azərbaycan dili"),
    ("be", "bel", "Belarusian", "беларуская"),
    ("bg", "bul", "Bulgarian", "български"),
    ("bn", "ben", "Bengali", "বাংলা"),
    ("bs", "bos", "Bosnian", "bosanski"),
    ("ca", "cat", "Catalan", "català"),
    ("cs", "ces", "Czech", "čeština"),
    ("cy", "cym", "Welsh", "Cymraeg"),
    ("da", "dan", "Danish", "dansk"),
    ("de", "deu", "German", "Deutsch"),
    ("el", "ell", "Greek", "Ελληνικά"),
    ("en", "eng", "English", "English"),
    ("eo", "epo", "Esperanto", "Esperanto"),
    ("es", "spa", "Spanish", "Español"),
    ("et", "est", "Estonian", "eesti"),
    ("eu", "eus", "Basque", "euskara"),
    ("fa", "fas", "Persian", "فارسی"),
    ("fi", "fin", "Finnish", "suomi"),
    ("fr", "fra", "French", "Français"),
    ("ga", "gle", "Irish", "Gaeilge"),
    ("gl", "glg", "Galician", "galego"),
    ("he", "heb", "Hebrew", "עברית"),
    ("hi", "hin", "Hindi", "हिन्दी"),
    ("hr", "hrv", "Croatian", "hrvatski"),
    ("hu", "hun", "Hungarian", "magyar"),
    ("hy", "hye", "Armenian", "հայերեն"),
    ("id", "ind", "Indonesian", "Bahasa Indonesia"),
    ("is", "isl", "Icelandic", "íslenska"),
    ("it", "ita", "Italian", "italiano"),
    ("ja", "jpn", "Japanese", "日本語"),
    ("ka", "kat", "Georgian", "ქართული"),
    ("kk", "kaz", "Kazakh", "қазақ тілі"),
    ("km", "khm", "Khmer", "ខ្មែរ"),
    ("ko", "kor", "Korean", "한국어"),
    ("lt", "lit", "Lithuanian", "lietuvių"),
    ("lv", "lav", "Latvian", "latviešu"),
    ("mk", "mkd", "Macedonian", "македонски"),
    ("mn", "mon", "Mongolian", "монгол"),
    ("ms", "msa", "Malay", "Bahasa Melayu"),
    ("mt", "mlt", "Maltese", "Malti"),
    ("nb", "nob", "Norwegian Bokmål", "norsk bokmål"),
    ("ne", "nep", "Nepali", "नेपाली"),
    ("nl", "nld", "Dutch", "Nederlands"),
    ("no", "nor", "Norwegian", "norsk"),
    ("pl", "pol", "Polish", "polski"),
    ("pt", "por", "Portuguese", "Português"),
    ("ro", "ron", "Romanian", "română"),
    ("ru", "rus", "Russian", "русский"),
    ("sk", "slk", "Slovak", "slovenčina"),
    ("sl", "slv", "Slovenian", "slovenščina"),
    ("sq", "sqi", "Albanian", "shqip"),
    ("sr", "srp", "Serbian", "српски"),
    ("sv", "swe", "Swedish", "svenska"),
    ("sw", "swa", "Swahili", "Kiswahili"),
    ("ta", "tam", "Tamil", "தமிழ்"),
    ("th", "tha", "Thai", "ไทย"),
    ("tr", "tur", "Turkish", "Türkçe"),
    ("uk", "ukr", "Ukrainian", "українська"),
    ("ur", "urd", "Urdu", "اردو"),
    ("vi", "vie", "Vietnamese", "Tiếng Việt"),
    ("zh", "zho", "Chinese", "中文"),
]


def _build_lookup() -> dict[str, str]:
    lut: dict[str, str] = {}
    for iso1, iso3, english, native in ISO639:
        for k in (iso1, iso3, english, native):
            lut.setdefault(k.casefold(), iso3)
    return lut


_LOOKUP = _build_lookup()


def normalize_language_array(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Vectorized: any of {iso1, iso3, English name, native name}
    (case-insensitive) → iso3; unmatched/null → ``und``."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    s = pd.Series(arr.to_pandas(), copy=False).fillna("")
    out = s.str.casefold().map(_LOOKUP).fillna(UNKNOWN)
    return pa.array(out.to_numpy(dtype=object), pa.string())


def normalize_language(value: str | None) -> str:
    """Scalar twin (oracle/simulator paths)."""
    if not value:
        return UNKNOWN
    return _LOOKUP.get(value.casefold(), UNKNOWN)
