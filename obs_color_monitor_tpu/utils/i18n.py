"""Minimal locale machinery (reference data/locale/*.ini, 5 languages).

The reference looks up UI strings through ``obs_module_text``.  Here
:func:`text` resolves keys against JSON locale tables; en-US ships built in,
additional languages drop into ``data/locale/<tag>.json``.
"""

from __future__ import annotations

import json
from pathlib import Path

_LOCALE_DIR = Path(__file__).resolve().parents[1] / "data" / "locale"

# Built-in en-US strings (the reference's data/locale/en-US.ini key set).
_EN_US = {
    "Vectorscope": "Vectorscope",
    "Waveform": "Waveform",
    "Histogram": "Histogram",
    "Zebra": "Zebra",
    "FalseColor": "False Color",
    "FocusPeaking.Name": "Focus Peaking",
    "ROI": "ROI",
    "Source": "Source",
    "Scale": "Scale",
    "Bypass": "Bypass",
    "Intensity": "Intensity",
    "Graticule": "Graticule",
    "Skin tone color": "Skin tone color",
    "Color space": "Color space",
    "Auto": "Auto",
    "601": "601",
    "709": "709",
    "Display": "Display",
    "Overlay": "Overlay",
    "Stack": "Stack",
    "Parade": "Parade",
    "Components": "Components",
    "RGB": "RGB",
    "Luma": "Luma",
    "Chroma": "Chroma",
    "YUV": "YUV",
    "Height": "Height",
    "Log scale": "Log scale",
    "Level mode": "Level mode",
    "Pixels": "Pixels",
    "Ratio": "Ratio",
    "Top level": "Top level",
    "None": "None",
    "Threshold (lower)": "Threshold (lower)",
    "Threshold (high)": "Threshold (high)",
    "Interleave": "Interleave",
    "VS.Prop.ColorType": "Color",
    "VS.Prop.ColorType.White": "White",
    "VS.Prop.ColorType.UV": "Chroma",
    "FalseColor.Prop.LUT": "Use LUT",
    "FalseColor.Prop.LUTFile": "LUT file",
    "Prop.ShowKey": "Show key",
    "Prop.ShowKey.None": "None",
    "Prop.ShowKey.Left": "Left",
    "Prop.ShowKey.Right": "Right",
    "Prop.ShowKey.Outside": "Outside",
    "Prop.ShowKey.Top": "Top",
    "Prop.ShowKey.Bottom": "Bottom",
    "Prop.ShowKey.Below": "Below",
    "FocusPeaking.Prop.PeakingColor": "Peaking color",
    "FocusPeaking.Prop.PeakingThreshold": "Peaking threshold",
    "FocusPeaking.Prop.ActualSize": "Actual size",
    "New Scope Dock...": "New Scope Dock...",
}

_current: dict[str, str] = dict(_EN_US)
_tag = "en-US"


def set_locale(tag: str) -> None:
    """Switch locale; unknown tags fall back to en-US keys per string."""
    global _current, _tag
    _current = dict(_EN_US)
    _tag = tag
    if tag != "en-US":
        path = _LOCALE_DIR / f"{tag}.json"
        if path.exists():
            _current.update(json.loads(path.read_text()))


def get_locale() -> str:
    return _tag


def text(key: str) -> str:
    """obs_module_text analog: missing keys return the key itself."""
    return _current.get(key, key)
