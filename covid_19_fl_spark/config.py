"""Config resolution (SURVEY §3.1 step 2) — the reference's pattern:
``config.json`` if present, else environment variables (cv-api.py:16-38,
sampleconfig.json). Engine-side it feeds connector options (Mongo URI,
SMTP endpoint, REST base URLs); the query core never reads config.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field


@dataclass(frozen=True)
class EngineConfig:
    """Connector/side-channel settings, resolved once at startup."""

    mongodb_uri: str | None = None
    mongodb_database: str = "covid"
    smtp_server: str | None = None
    smtp_port: int = 587
    email_from: str | None = None
    email_to: str | None = None
    email_password: str | None = None
    rest_base_url: str | None = None
    extras: dict = field(default_factory=dict)


# config.json key → (env var, attribute) mapping, following the
# reference's names (cv-api.py:19-38) without inventing new ones.
_KEYS = {
    "mongodb_uri": ("MONGODB_URI", "mongodb_uri"),
    "mongodb_database": ("MONGODB_DATABASE", "mongodb_database"),
    "smtp_server": ("SMTP_SERVER", "smtp_server"),
    "smtp_port": ("SMTP_PORT", "smtp_port"),
    "email_from": ("EMAIL_FROM", "email_from"),
    "email_to": ("EMAIL_TO", "email_to"),
    "email_password": ("EMAIL_PASSWORD", "email_password"),
    "rest_base_url": ("REST_BASE_URL", "rest_base_url"),
}


def load_config(path: str = "config.json", env: dict | None = None) -> EngineConfig:
    """``config.json`` wins per-key; env vars fill the gaps; dataclass
    defaults last — the reference's exact precedence."""
    env = os.environ if env is None else env
    file_cfg: dict = {}
    if os.path.exists(path):
        with open(path) as f:
            file_cfg = json.load(f)

    kwargs: dict = {}
    known = set()
    for key, (env_var, attr) in _KEYS.items():
        known.add(key)
        val = file_cfg.get(key, env.get(env_var))
        if val is not None:
            if attr == "smtp_port":
                val = int(val)
            kwargs[attr] = val
    kwargs["extras"] = {k: v for k, v in file_cfg.items() if k not in known}
    return EngineConfig(**kwargs)
