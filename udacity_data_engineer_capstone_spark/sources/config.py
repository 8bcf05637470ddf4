"""INI-config source registry (SURVEY §2.1 ``src_config``).

The reference resolves its four I/O paths from ``cp.cfg`` via
``configparser`` (``/root/reference/etl.py:11-17``). Same driver-side
mechanism here, generalized to a table→path mapping usable by the catalog.
"""

from __future__ import annotations

import configparser


def read_paths(config_path: str, section: str = "PATHS") -> dict[str, str]:
    cfg = configparser.ConfigParser()
    with open(config_path, encoding="utf-8") as fh:
        cfg.read_file(fh)
    return dict(cfg[section])


def render_paths(paths: dict[str, str], section: str = "PATHS") -> str:
    lines = [f"[{section}]"]
    lines += [f"{k} = {v}" for k, v in paths.items()]
    return "\n".join(lines) + "\n"
