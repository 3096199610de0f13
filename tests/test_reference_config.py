"""ConfigTest conformance port (test/config_test.cpp:18-170): the
server bootstrap's three-layer option resolution — command line, env
vars, ``--config`` ini file — including the layer-precedence matrix and
the exact validation error strings. The ini fixtures mirror the
reference's test/valid_config.ini / valid_sparse_config.ini /
bad_config.ini byte-for-byte in the parts the parser observes."""

from __future__ import annotations

import pytest

from typesense_ray.config import ServerConfig, resolve_server_config

VALID_INI = """\
; Sample Typesense Configuration

[server]

data-dir = /tmp/ts
api-key = 1234

log-dir = /tmp/logs

listen-port = 9090
"""

SPARSE_INI = """\
; Sample Typesense Configuration

[server]
api-key = supersecret
listen-address = localhost
"""

BAD_INI = """\
; Bad Typesense Configuration

[foobar

data-dir: /tmp/ts
"""


def test_load_cmd_line_arguments():
    """ConfigTest.LoadCmdLineArguments (test/config_test.cpp:18-39)."""
    cfg = ServerConfig()
    cfg.load_cmd_args({
        "data-dir": "/tmp/data", "api-key": "abcd", "listen-port": 8080,
    })
    assert cfg.api_key == "abcd"
    assert cfg.api_port == 8080
    assert cfg.data_dir == "/tmp/data"


def test_load_env_vars():
    """ConfigTest.LoadEnvVars (test/config_test.cpp:41-50)."""
    cfg = ServerConfig()
    cfg.load_env({
        "TYPESENSE_DATA_DIR": "/tmp/ts", "TYPESENSE_LISTEN_PORT": "9090",
    })
    assert cfg.data_dir == "/tmp/ts"
    assert cfg.api_port == 9090


def test_bad_configuration_returns_error():
    """ConfigTest.BadConfigurationReturnsError (test/config_test.cpp:52-66):
    the two missing-required-field messages, in the reference's check
    order (data dir first)."""
    cfg1 = ServerConfig()
    cfg1.api_key = "abcd"
    ok, err = cfg1.is_valid()
    assert not ok and err == "Data directory is not specified."

    cfg2 = ServerConfig()
    cfg2.data_dir = "/tmp/ts"
    ok, err = cfg2.is_valid()
    assert not ok and err == "API key is not specified."


def test_load_config_file(tmp_path):
    """ConfigTest.LoadConfigFile (test/config_test.cpp:68-90)."""
    p = tmp_path / "valid_config.ini"
    p.write_text(VALID_INI)
    cfg = ServerConfig()
    cfg.load_file(str(p))
    ok, _ = cfg.is_valid()
    assert ok
    assert cfg.data_dir == "/tmp/ts"
    assert cfg.api_key == "1234"
    assert cfg.log_dir == "/tmp/logs"
    assert cfg.api_port == 9090
    assert cfg.enable_cors is False


def test_load_incomplete_config_file(tmp_path):
    """ConfigTest.LoadIncompleteConfigFile (test/config_test.cpp:92-108):
    a parseable file that never sets data-dir fails validation with the
    data-dir message (the file itself is fine)."""
    p = tmp_path / "valid_sparse_config.ini"
    p.write_text(SPARSE_INI)
    cfg = ServerConfig()
    cfg.load_file(str(p))
    ok, err = cfg.is_valid()
    assert not ok and err == "Data directory is not specified."


def test_load_bad_config_file(tmp_path):
    """ConfigTest.LoadBadConfigFile (test/config_test.cpp:111-129): an
    unterminated section header is a parse error remembered until
    validation."""
    p = tmp_path / "bad_config.ini"
    p.write_text(BAD_INI)
    cfg = ServerConfig()
    cfg.load_file(str(p))
    ok, err = cfg.is_valid()
    assert not ok and err == "Error parsing the configuration file."


def test_cmd_line_args_override_config_file_and_env_vars(tmp_path):
    """ConfigTest.CmdLineArgsOverrideConfigFileAndEnvVars
    (test/config_test.cpp:130-170): env → file → cmdline, later layers
    winning field-by-field."""
    p = tmp_path / "valid_sparse_config.ini"
    p.write_text(SPARSE_INI)
    env = {
        "TYPESENSE_DATA_DIR": "/tmp/ts",
        "TYPESENSE_LOG_DIR": "/tmp/ts_log",
        "TYPESENSE_LISTEN_PORT": "9090",
        "TYPESENSE_LISTEN_ADDRESS": "127.0.0.1",
        "TYPESENSE_ENABLE_CORS": "TRUE",
    }
    cfg = resolve_server_config(
        {
            "data-dir": "/tmp/data",
            "api-key": "abcd",
            "listen-address": "192.168.10.10",
            "config": str(p),
        },
        env=env,
    )
    assert cfg.api_key == "abcd"          # cmdline beats the file
    assert cfg.data_dir == "/tmp/data"    # cmdline beats env
    assert cfg.log_dir == "/tmp/ts_log"   # env survives (nobody overrides)
    assert cfg.api_port == 9090           # env survives
    assert cfg.enable_cors is True        # env TRUE survives
    # cmdline listen-address beats the file's 'localhost' and env's
    # 127.0.0.1 (the reference asserts the same final listen_address via
    # the full option dump; config_test.cpp:168)
    assert cfg.api_address == "192.168.10.10"


@pytest.mark.parametrize("val,want", [
    ("TRUE", True), ("true", True), ("TrUe", True),
    ("FALSE", False), ("", False), ("1", False),
])
def test_env_enable_cors_is_exact_true_match(val, want):
    """include/config.h:216-218: env CORS is an uppercase string compare
    with "TRUE" — "1" does NOT enable it, and absence resets to False."""
    cfg = ServerConfig()
    cfg.enable_cors = True  # prove the unconditional reset
    cfg.load_env({"TYPESENSE_ENABLE_CORS": val} if val else {})
    assert cfg.enable_cors is want


def test_env_reference_address_quirks():
    """include/config.h:192-204: TYPESENSE_API_ADDRESS copies
    LISTEN_ADDRESS into api_address, and PEERING_ADDRESS also lands in
    api_address — both preserved verbatim."""
    cfg = ServerConfig()
    cfg.load_env({
        "TYPESENSE_LISTEN_ADDRESS": "10.0.0.1",
        "TYPESENSE_API_ADDRESS": "10.0.0.2",
    })
    assert cfg.api_address == "10.0.0.1"

    cfg2 = ServerConfig()
    cfg2.load_env({"TYPESENSE_PEERING_ADDRESS": "192.168.1.7"})
    assert cfg2.api_address == "192.168.1.7"
    assert cfg2.peering_address == ""


def test_env_resets_unset_string_fields():
    """include/config.h:176-183: data_dir/log_dir/api_key/etc are
    assigned unconditionally from env — loading an empty environment
    wipes them (the reference's exact behavior; the server loads env
    FIRST so nothing is lost in practice)."""
    cfg = ServerConfig()
    cfg.data_dir, cfg.api_key = "/keep", "secret"
    cfg.load_env({})
    assert cfg.data_dir == "" and cfg.api_key == ""


def test_flag_enable_cors_only_sets_true(tmp_path):
    """include/config.h:394-396: the --enable-cors flag can only turn
    CORS on; its absence leaves the file/env decision standing."""
    p = tmp_path / "cors.ini"
    p.write_text("[server]\nenable-cors = true\n")
    cfg = ServerConfig()
    cfg.load_file(str(p))
    cfg.load_cmd_args({"data-dir": "/tmp/x"})
    assert cfg.enable_cors is True
    cfg.load_cmd_args({"enable-cors": True})
    assert cfg.enable_cors is True


def test_malformed_ini_values_fall_back_to_hardcoded_defaults(tmp_path):
    """INIReader::GetInteger/GetReal/GetBoolean (include/INIReader.h:
    397-432) fall back to the HARDCODED defaults — not the earlier
    layer's value — when a present key's value fails the strtol/strtod
    prefix parse; partial prefixes keep the consumed digits and base-0
    hex/octal parse like strtol."""
    p = tmp_path / "bad.ini"
    p.write_text("[server]\n"
                 "api-port = abc\n"
                 "peering-port = 12xyz\n"
                 "snapshot-interval-seconds = 0x10\n"
                 "catch-up-threshold-percentage = 010\n"
                 "max-memory-ratio = banana\n"
                 "enable-cors = banana\n")
    cfg = ServerConfig()
    cfg.load_env({"TYPESENSE_API_PORT": "9999"})
    assert cfg.api_port == 9999
    cfg.load_file(str(p))
    assert cfg.config_file_validity == 1
    assert cfg.api_port == 8108            # malformed -> hardcoded default
    assert cfg.peering_port == 12          # strtol partial prefix
    assert cfg.snapshot_interval_seconds == 16   # 0x10, strtol base 0
    assert cfg.catch_up_threshold_percentage == 8  # 010 octal
    assert cfg.max_memory_ratio == 1.0
    assert cfg.enable_cors is False
