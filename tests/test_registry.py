"""Source registry: the reference's 11-entry plugin table."""

import numpy as np
import pytest

from obs_color_monitor_tpu.config import VectorscopeColorType
from obs_color_monitor_tpu.registry import REGISTRY, create_source, enum_sources
from obs_color_monitor_tpu.utils.persistence import GlobalConfig


def test_registry_inventory():
    """11 registered infos like obs_module_load (src/plugin-main.c:58-108)."""
    assert len(REGISTRY) == 11
    assert sorted(s for s in REGISTRY if REGISTRY[s].kind == "filter") == [
        "falsecolor_filter",
        "focuspeaking_filter",
        "zebra_filter",
    ]
    # v1 is registered but obsolete (reference OBS_SOURCE_CAP_OBSOLETE,
    # src/vectorscope.c:487)
    assert REGISTRY["vectorscope_source"].obsolete
    assert not REGISTRY["vectorscope_source.v2"].obsolete


def test_v1_v2_defaults():
    """v1 defaults to white draw, v2 to chroma tint
    (reference vss_get_defaults_v1 vs vss_get_defaults,
    src/vectorscope.c:155-167)."""
    v1 = create_source("vectorscope_source")
    v2 = create_source("vectorscope_source.v2")
    assert v1.config.color_type == VectorscopeColorType.WHITE
    assert v2.config.color_type == VectorscopeColorType.UV


def test_global_config_gates():
    g = GlobalConfig(show_sources=False)
    with pytest.raises(PermissionError):
        create_source("waveform_source", global_config=g)
    # filters still allowed
    create_source("zebra_filter", global_config=g)
    g2 = GlobalConfig(show_filters=False)
    with pytest.raises(PermissionError):
        create_source("zebra_filter", global_config=g2)


def test_enum_sources():
    srcs = enum_sources("source")
    assert "vectorscope_source.v2" in srcs
    assert "vectorscope_source" not in srcs  # obsolete hidden by default
    assert "zebra_filter" not in srcs
    assert "vectorscope_source" in enum_sources("source", include_obsolete=True)


def test_created_source_works():
    his = create_source("histogram_source")
    f = np.zeros((32, 32, 4), np.uint8)
    f[..., 3] = 255
    his.push_frame(f)
    assert his.counts() is not None

def test_dock_default_shown_flags():
    """A fresh dock mirrors ScopeWidget::default_properties (reference
    src/scope-widget.cpp:496-506): every source's "-shown" defaults true
    EXCEPT focus peaking, which the loop explicitly skips."""
    from obs_color_monitor_tpu.config import DockConfig

    dk = DockConfig()
    assert dk.show_roi
    assert dk.show_vectorscope
    assert dk.show_waveform
    assert dk.show_histogram
    assert dk.show_zebra
    assert dk.show_falsecolor
    assert not dk.show_focuspeaking


def test_histogram_graticule_property_model():
    """The histogram keeps TWO horizontal-step settings and applies the one
    matching the level mode (reference src/histogram.c:137-151); the
    vertical-lines combo offers {0,1,2,4,5,10} (src/histogram.c:274-281)."""
    from obs_color_monitor_tpu.config import HistogramConfig, LevelMode

    c = HistogramConfig(
        level_mode=LevelMode.PIXEL,
        graticule_horizontal_step_fixed=200.0,
        graticule_horizontal_step_ratio=5.0,
    )
    assert c.graticule_horizontal_step == 200.0
    c.level_mode = LevelMode.RATIO
    assert c.graticule_horizontal_step == 5.0
    c.level_mode = LevelMode.AUTO  # never loads a step -> no H lines
    assert c.graticule_horizontal_step == -1.0
    # combo snapping, same list as the waveform's graticule_lines
    assert HistogramConfig(graticule_vertical_lines=3).graticule_vertical_lines in (2, 4)
    assert HistogramConfig(graticule_vertical_lines=7).graticule_vertical_lines == 5
    assert HistogramConfig(graticule_vertical_lines=100).graticule_vertical_lines == 10


def test_histogram_graticule_legacy_alias():
    """The pre-split single ``graticule_horizontal_step`` name still works:
    as a Scope.update setting and through saved-dock JSON (it writes BOTH
    mode-paired fields); read-only derived properties raise the same
    KeyError as unknown settings."""
    import pytest

    from obs_color_monitor_tpu.config import HistogramConfig, LevelMode
    from obs_color_monitor_tpu.models import Histogram
    from obs_color_monitor_tpu.utils.persistence import config_from_dict

    h = Histogram(HistogramConfig(level_mode=LevelMode.PIXEL))
    h.update(graticule_horizontal_step=100.0)
    assert h.config.graticule_horizontal_step_fixed == 100.0
    assert h.config.graticule_horizontal_step_ratio == 100.0
    assert h.config.graticule_horizontal_step == 100.0

    with pytest.raises(KeyError):
        h.update(level_fixed=123)  # read-only derived property
    with pytest.raises(KeyError):
        h.update(no_such_setting=1)

    # old saved dock JSON (pre-split field name) keeps its H graticule
    c = config_from_dict(
        HistogramConfig,
        {"level_mode": int(LevelMode.RATIO), "graticule_horizontal_step": 20.0},
    )
    assert c.graticule_horizontal_step == 20.0
    assert c.graticule_horizontal_step_fixed == 20.0


def test_config_key_generation_memoization():
    """config_key is memoized per config GENERATION: steady-state stream
    revalidation is O(1) dict probes, while any field assignment (update()
    or direct attribute set) bumps the generation and re-derives."""
    import dataclasses

    from obs_color_monitor_tpu.config import WaveformConfig, config_key

    c = WaveformConfig()
    k1 = config_key(c)
    assert config_key(c) is k1  # cache hit returns the same tuple object
    c.intensity = 99  # direct field assignment bumps the generation
    k2 = config_key(c)
    assert k2 is not k1 and k2 != k1
    assert config_key(c) is k2
    # skip variants cache independently under one generation
    ks = config_key(c, skip=("intensity",))
    assert ks != k2
    assert config_key(c, skip=("intensity",)) is ks
    # value identity: an equal-valued fresh config derives an equal key
    assert config_key(WaveformConfig(intensity=99)) == k2
    # bookkeeping attributes are not dataclass fields (persistence walks
    # dataclasses.fields and must never see them)
    assert "_gen" not in {f.name for f in dataclasses.fields(c)}
