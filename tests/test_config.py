"""Config loading tests (reference: src/settings.rs:202-239)."""

import os

import pytest

from hotdog_spark.config import ConfigError, load, load_dict

CONFIGS = os.path.join(os.path.dirname(__file__), "configs")


def test_load_canonical():
    s = load(os.path.join(CONFIGS, "canonical.yml"))
    assert len(s.rules) == 3
    assert s.rules[0].regex is not None
    assert s.rules[1].jmespath == "meta.topic"
    assert s.global_.listen.port == 1514


def test_populate_caches_json_str():
    # the merge action pre-serializes its JSON (src/settings.rs:80-87)
    s = load(os.path.join(CONFIGS, "single-rule-with-merge.yml"))
    assert s.rules[0].actions[0].json_str is not None
    assert '"hotdog"' in s.rules[0].actions[0].json_str


def test_missing_port_fails():
    with pytest.raises(ConfigError, match="global.listen.port"):
        load_dict({"global": {"listen": {}}, "rules": []}, environ={})


def test_wrong_extension_fails(tmp_path):
    p = tmp_path / "config.json"
    p.write_text("{}")
    with pytest.raises(ConfigError, match=".yml"):
        load(str(p))


def test_env_overlay():
    s = load_dict(
        {"global": {"listen": {"port": 1514}}, "rules": []},
        environ={"HOTDOG_GLOBAL__LISTEN__PORT": "2514"},
    )
    assert s.global_.listen.port == 2514


def test_rule_needs_exactly_one_matcher():
    base = {"global": {"listen": {"port": 1}}}
    with pytest.raises(ConfigError):
        load_dict({**base, "rules": [{"field": "msg", "actions": []}]}, environ={})
    with pytest.raises(ConfigError):
        load_dict(
            {**base, "rules": [{"field": "msg", "regex": "a", "jmespath": "b", "actions": []}]},
            environ={},
        )


def test_invalid_field_fails():
    with pytest.raises(ConfigError, match="field"):
        load_dict(
            {"global": {"listen": {"port": 1}}, "rules": [{"field": "nope", "regex": "a", "actions": []}]},
            environ={},
        )


def test_kafka_parquet_mutually_exclusive():
    with pytest.raises(ConfigError, match="mutually exclusive"):
        load_dict(
            {
                "global": {
                    "listen": {"port": 1},
                    "kafka": {"conf": {}},
                    "parquet": {"url": "s3://x"},
                },
                "rules": [],
            },
            environ={},
        )


def test_uuid_assigned():
    s = load(os.path.join(CONFIGS, "canonical.yml"))
    assert len({r.uuid for r in s.rules}) == 3


def test_reference_example_configs_load_unchanged():
    """The reference's shipped example configs (hotdog.yml,
    hotdog-parquet.yml) load without edits — the switch-without-rewriting
    property a migrating user needs."""
    kafka_cfg = load(os.path.join(CONFIGS, "hotdog-kafka-example.yml"))
    g = kafka_cfg.global_
    assert g.listen.tls is not None
    assert g.kafka.buffer == 1024
    assert g.kafka.topic == "test"
    assert g.kafka.conf["bootstrap.servers"] == "127.0.0.1:9092"
    assert g.status["port"] == 8585
    assert [r.regex or r.jmespath for r in kafka_cfg.rules] == [
        r"^hello\s+(?P<name>\w+)?", "meta.topic", ".*",
    ]

    pq_cfg = load(os.path.join(CONFIGS, "hotdog-parquet-example.yml"))
    gp = pq_cfg.global_
    assert gp.parquet.url == "s3://hotdog/streams/"
    assert gp.parquet.buffer == 1024000
    assert gp.parquet.flush_ms == 60000
    assert gp.kafka is None
