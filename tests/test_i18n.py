"""i18n (reference src/i18n/mod.rs + locales/): locale normalization
(the reference's own test matrix), env init, %{param} interpolation,
fallback chain."""

import pytest

from baram_ray import i18n


@pytest.fixture(autouse=True)
def _reset_locale():
    yield
    i18n.set_locale("en")


def test_normalize_locale():
    # mod.rs test_normalize_locale, verbatim matrix
    for raw in ("ko", "ko-KR", "ko_KR", "korean"):
        assert i18n.normalize_locale(raw) == "ko"
    for raw in ("en", "en-US", "english"):
        assert i18n.normalize_locale(raw) == "en"
    for raw in ("zh", "zh-CN", "chinese"):
        assert i18n.normalize_locale(raw) == "zh"
    assert i18n.normalize_locale("unknown") == "en"


def test_set_and_get_locale():
    i18n.set_locale("ko")
    assert i18n.current_locale() == "ko"
    i18n.set_locale("fr")                        # unsupported → en
    assert i18n.current_locale() == "en"


def test_init_from_env(monkeypatch):
    monkeypatch.setenv("BARAM_LANG", "ko_KR")
    i18n.init_from_env()
    assert i18n.current_locale() == "ko"
    monkeypatch.delenv("BARAM_LANG")
    i18n.init_from_env()
    assert i18n.current_locale() == "en"


def test_translation_and_interpolation():
    i18n.set_locale("en")
    assert i18n.t("cli.build.completed", count=500, seconds=1.2) == \
        "Indexed 500 documents in 1.2s"
    i18n.set_locale("ko")
    assert i18n.t("cli.build.completed", count=500, seconds=1.2) == \
        "1.2초 동안 문서 500건 인덱싱 완료"
    # missing arg keeps the placeholder (rust-i18n behavior)
    assert "%{count}" in i18n.t("cli.build.completed", seconds=1)


def test_fallback_chain():
    i18n.set_locale("zh")
    # key present in zh
    assert i18n.t("cli.app.starting") == "baram-ray 引擎启动"
    # key absent in zh → en fallback
    assert i18n.t("cli.build.completed", count=1, seconds=2) == \
        "Indexed 1 documents in 2s"
    # unknown key → key itself
    assert i18n.t("no.such.key") == "no.such.key"
