"""Config resolution + notification hook tests (SURVEY §3.1, §2.2 K6)."""

from __future__ import annotations

import json

from covid_19_fl_spark.config import load_config
from covid_19_fl_spark.sinks.notify import Notifier, RunSummary, format_summary
from covid_19_fl_spark.sources.mongo import mongo_options


def test_config_file_wins_over_env(tmp_path):
    p = tmp_path / "config.json"
    p.write_text(json.dumps({"mongodb_uri": "mongodb://file", "smtp_port": 2525,
                             "custom_key": "x"}))
    cfg = load_config(str(p), env={"MONGODB_URI": "mongodb://env", "SMTP_SERVER": "smtp.env"})
    assert cfg.mongodb_uri == "mongodb://file"      # file wins
    assert cfg.smtp_server == "smtp.env"            # env fills gaps
    assert cfg.smtp_port == 2525
    assert cfg.extras == {"custom_key": "x"}        # unknown keys preserved


def test_config_env_fallback_and_defaults(tmp_path):
    cfg = load_config(str(tmp_path / "missing.json"), env={"MONGODB_URI": "mongodb://env"})
    assert cfg.mongodb_uri == "mongodb://env"
    assert cfg.mongodb_database == "covid"          # dataclass default


def test_mongo_options_contract(tmp_path):
    cfg = load_config(str(tmp_path / "missing.json"), env={"MONGODB_URI": "mongodb://h"})
    opts = mongo_options(cfg, "florida")
    assert opts == {"connection.uri": "mongodb://h", "database": "covid",
                    "collection": "florida"}


def test_notifier_conditional_send():
    sent = []
    n = Notifier(lambda subject, body: sent.append((subject, body)))
    # cv-api.py:245-247: mail only when new rows landed.
    assert not n.notify_if_new(RunSummary(job="ingest", new_records=0, total_records=10))
    assert sent == []
    assert n.notify_if_new(RunSummary(job="ingest", new_records=3, total_records=13))
    assert len(sent) == 1 and "New records: 3" in sent[0][1]


def test_summary_format():
    s = format_summary(RunSummary(job="j", new_records=1, total_records=2, message="m"))
    assert s.splitlines() == ["Job: j", "New records: 1", "Total records: 2", "m"]
