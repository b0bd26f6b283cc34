"""Configuration-file defaults merge chain.

Re-expresses the reference's settings machinery
(``lexor/command/config.py:77-100`` ``read_config`` and
``:194-210`` ``set_style_cfg``): style parameters resolve as

    module ``DEFAULTS``  →  config-file section  →  CLI overrides

with ``os.path.expandvars`` applied to file values, exactly the
reference's precedence (consumed at ``lexor/command/to.py:228-249``).

The config file is INI format, found like the reference does:
``./lexor.config`` in the working directory, else
``$LEXOR_CONFIG_PATH/lexor.config`` when that variable is set (the
env path is committed to — no further fallback), else
``~/.lexor.config``.
Section names follow the reference's style-key shape
``{lang}-{kind}-{style}`` (``lexor/core/parser.py:126``), e.g.::

    [html-writer-markdown]
    width = 100

    [html-converter-text]
    drop = ad|banner
"""

from __future__ import annotations

import configparser
import os

#: module-level style defaults — the first layer of the merge chain
#: (the reference reads these from each style module's ``DEFAULTS``
#: dict; here styles are in-package dialects, so they register here)
STYLE_DEFAULTS: dict[str, dict[str, str]] = {
    "html-writer-markdown": {"width": "70"},
    "html-writer-xml": {},
    "html-converter-text": {},
}


def config_path() -> str | None:
    """The reference's search order (``config.py:77-100``):
    ``./lexor.config`` → ``$LEXOR_CONFIG_PATH/lexor.config`` →
    ``~/.lexor.config``. Returns None when no file exists."""
    cand = os.path.join(".", "lexor.config")
    if os.path.exists(cand):
        return cand
    env = os.environ.get("LEXOR_CONFIG_PATH")
    if env:
        # the reference COMMITS to the env path (config.py:87-88 reads
        # it with no home fallback; a missing file parses as empty) —
        # falling through to ~/.lexor.config here silently applied the
        # home config the reference would ignore (r5 review)
        cand = os.path.join(env, "lexor.config")
        return cand if os.path.exists(cand) else None
    cand = os.path.join(os.path.expanduser("~"), ".lexor.config")
    if os.path.exists(cand):
        return cand
    return None


def read_config(path: str | None = None) -> configparser.ConfigParser:
    """Parse the config file (empty parser when none found)."""
    # interpolation=None: values are filesystem paths (the [develop]
    # section stores absolute style paths) — BasicInterpolation would
    # crash cfg.set()/get() on any '%' in a path; $VAR expansion is
    # already handled via os.path.expandvars in style_defaults
    cfg = configparser.ConfigParser(allow_no_value=True, interpolation=None)
    path = path or config_path()
    if path:
        cfg.read(path)
    return cfg


def style_defaults(
    section: str,
    overrides: dict[str, str] | None = None,
    cfg: configparser.ConfigParser | None = None,
) -> dict[str, str]:
    """Resolve one style's parameters through the full merge chain:
    ``STYLE_DEFAULTS[section]`` → config-file ``[section]`` values
    (with ``os.path.expandvars``, as the reference applies) → explicit
    ``overrides`` (CLI ``style[param=val]`` specs) — the exact
    precedence of ``set_style_cfg`` (``config.py:194-210``)."""
    # the reference expands module DEFAULTS too (set_style_cfg:
    # ``os.path.expandvars(str(val))`` on each module value, r5
    # review) — a future '$HOME/...' default must resolve identically
    out = {
        var: os.path.expandvars(str(val))
        for var, val in STYLE_DEFAULTS.get(section, {}).items()
    }
    if cfg is None:
        cfg = read_config()
    if cfg.has_section(section):
        for var, val in cfg.items(section):
            out[var] = os.path.expandvars(val) if val is not None else val
    if overrides:
        out.update(overrides)
    return out
