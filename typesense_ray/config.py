"""Server bootstrap configuration (reference ``Config``,
``include/config.h:8-415``): the three-layer option resolution the
server binary performs at startup —

    load_env()  →  load_file(--config)  →  load_cmd_args(explicit args)

with later layers overriding earlier ones
(``test/config_test.cpp:130-170`` CmdLineArgsOverrideConfigFileAndEnvVars).
Driver-side metadata only; nothing here touches the distributed path.

Reference quirks preserved deliberately (they are observable behavior):

* ``load_env`` assigns ``data_dir``/``log_dir``/``api_key``/``nodes``/
  ``master``/ssl paths UNCONDITIONALLY (an unset variable resets the
  field to ""), but address/port/ratio fields only when the variable is
  non-empty (``include/config.h:175-230``).
* When ``TYPESENSE_API_ADDRESS`` is set the reference copies
  ``TYPESENSE_LISTEN_ADDRESS`` (not API_ADDRESS) into ``api_address``,
  and a set ``TYPESENSE_PEERING_ADDRESS`` ALSO lands in ``api_address``
  (``include/config.h:192-204``) — both faithfully mirrored.
* ``enable_cors`` from env is an unconditional ``== "TRUE"``
  (case-insensitive) — absence of the variable forces it back to False.
* On the command line ``--enable-cors`` is a flag: present → True,
  absent → leave whatever the earlier layers said
  (``include/config.h:394-396``).
* A ``--config`` file that fails to parse is remembered and surfaces
  from ``is_valid()`` as the exact reference error string
  (``include/config.h:404-407``).
"""

from __future__ import annotations

import configparser
import os
import re
from dataclasses import dataclass, field

# option name → (attribute, type). The listen-* names are the
# deprecated aliases of api-* (src/typesense_server_utils.cpp:77-105).
_STR_OPTS = {
    "data-dir": "data_dir",
    "log-dir": "log_dir",
    "api-key": "api_key",
    "search-only-api-key": "search_only_api_key",
    "listen-address": "api_address",
    "api-address": "api_address",
    "master": "master",
    "ssl-certificate": "ssl_certificate",
    "ssl-certificate-key": "ssl_certificate_key",
    "peering-address": "peering_address",
    "nodes": "nodes",
}
_INT_OPTS = {
    "listen-port": "api_port",
    "api-port": "api_port",
    "peering-port": "peering_port",
    "snapshot-interval-seconds": "snapshot_interval_seconds",
    "catch-up-threshold-percentage": "catch_up_threshold_percentage",
}
_FLOAT_OPTS = {"max-memory-ratio": "max_memory_ratio"}

# the reference's INIReader falls back to these HARDCODED defaults when
# a present key's value fails strtol/strtod parsing (include/config.h:
# 288-320, include/INIReader.h:397-432) — NOT to the earlier layer's
# value
_INI_DEFAULTS = {
    "listen-port": 8108, "api-port": 8108, "peering-port": 8107,
    "snapshot-interval-seconds": 3600,
    "catch-up-threshold-percentage": 95,
    "max-memory-ratio": 1.0,
}

_INT_PREFIX = re.compile(r"\s*([+-]?)(0[xX][0-9a-fA-F]+|[0-9]+)")
_FLOAT_PREFIX = re.compile(
    r"\s*[+-]?(\d+\.?\d*([eE][+-]?\d+)?|\.\d+([eE][+-]?\d+)?)")


def _ini_int(s: str, default: int) -> int:
    """``INIReader::GetInteger`` — ``strtol(value, &end, 0)`` prefix
    parse (decimal / 0x hex / leading-0 octal, partial parses keep the
    consumed prefix); no digits consumed → the hardcoded default."""
    m = _INT_PREFIX.match(s)
    if not m:
        return default
    sign, digits = m.groups()
    if digits[:2].lower() == "0x":
        val = int(digits, 16)
    elif digits.startswith("0") and len(digits) > 1:
        val = int(re.match(r"0[0-7]*", digits).group(), 8)
    else:
        val = int(digits, 10)
    return -val if sign == "-" else val


def _ini_float(s: str, default: float) -> float:
    """``INIReader::GetReal`` — ``strtod`` prefix parse; no conversion →
    the hardcoded default."""
    m = _FLOAT_PREFIX.match(s)
    if not m:
        return default
    return float(m.group())


def _ini_bool(s: str, default: bool) -> bool:
    """``INIReader::GetBoolean`` — case-insensitive true/yes/on/1 vs
    false/no/off/0; anything else → the hardcoded default."""
    v = s.strip().lower()
    if v in ("true", "yes", "on", "1"):
        return True
    if v in ("false", "no", "off", "0"):
        return False
    return default


@dataclass
class ServerConfig:
    """``Config`` (include/config.h:8-49): defaults match the C++
    constructor."""

    data_dir: str = ""
    log_dir: str = ""
    api_key: str = ""
    search_only_api_key: str = ""  # @deprecated in the reference too
    api_address: str = "0.0.0.0"
    api_port: int = 8108
    peering_address: str = ""
    peering_port: int = 8107
    nodes: str = ""
    master: str = ""
    ssl_certificate: str = ""
    ssl_certificate_key: str = ""
    enable_cors: bool = False
    max_memory_ratio: float = 1.0
    snapshot_interval_seconds: int = 3600
    catch_up_threshold_percentage: int = 95
    config_file: str = ""
    config_file_validity: int = field(default=0)  # 0 none, 1 ok, -1 bad

    # -- layer 1: environment (include/config.h:175-231) ----------------

    def load_env(self, env: dict[str, str] | None = None) -> None:
        e = os.environ if env is None else env

        def get(name: str) -> str:
            return e.get(name, "") or ""

        # unconditional: unset variables RESET these to ""
        self.data_dir = get("TYPESENSE_DATA_DIR")
        self.log_dir = get("TYPESENSE_LOG_DIR")
        self.api_key = get("TYPESENSE_API_KEY")
        self.search_only_api_key = get("TYPESENSE_SEARCH_ONLY_API_KEY")
        if get("TYPESENSE_LISTEN_ADDRESS"):
            self.api_address = get("TYPESENSE_LISTEN_ADDRESS")
        if get("TYPESENSE_LISTEN_PORT"):
            self.api_port = int(get("TYPESENSE_LISTEN_PORT"))
        if get("TYPESENSE_API_ADDRESS"):
            # reference quirk: copies LISTEN_ADDRESS (include/config.h:194)
            self.api_address = get("TYPESENSE_LISTEN_ADDRESS")
        if get("TYPESENSE_API_PORT"):
            self.api_port = int(get("TYPESENSE_API_PORT"))
        if get("TYPESENSE_PEERING_ADDRESS"):
            # reference quirk: lands in api_address (include/config.h:202)
            self.api_address = get("TYPESENSE_PEERING_ADDRESS")
        if get("TYPESENSE_PEERING_PORT"):
            self.peering_port = int(get("TYPESENSE_PEERING_PORT"))
        self.nodes = get("TYPESENSE_NODES")
        self.master = get("TYPESENSE_MASTER")
        self.ssl_certificate = get("TYPESENSE_SSL_CERTIFICATE")
        self.ssl_certificate_key = get("TYPESENSE_SSL_CERTIFICATE_KEY")
        self.enable_cors = get("TYPESENSE_ENABLE_CORS").upper() == "TRUE"
        if get("TYPESENSE_MAX_MEMORY_RATIO"):
            self.max_memory_ratio = float(get("TYPESENSE_MAX_MEMORY_RATIO"))
        if get("TYPESENSE_SNAPSHOT_INTERVAL_SECONDS"):
            self.snapshot_interval_seconds = int(
                get("TYPESENSE_SNAPSHOT_INTERVAL_SECONDS"))
        if get("TYPESENSE_CATCH_UP_THRESHOLD_PERCENTAGE"):
            self.catch_up_threshold_percentage = int(
                get("TYPESENSE_CATCH_UP_THRESHOLD_PERCENTAGE"))

    # -- layer 2: --config ini file (include/config.h:232-322) ----------

    def load_file(self, config_path: str | None) -> None:
        if not config_path:
            self.config_file_validity = 0
            return
        self.config_file = config_path
        reader = configparser.ConfigParser(interpolation=None)
        try:
            with open(config_path) as f:
                reader.read_file(f)
        except (OSError, configparser.Error, UnicodeDecodeError):
            self.config_file_validity = -1
            return
        self.config_file_validity = 1
        if not reader.has_section("server"):
            return
        sec = reader["server"]
        for key, attr in _STR_OPTS.items():
            if key in sec:
                setattr(self, attr, sec.get(key))
        for key, attr in _INT_OPTS.items():
            if key in sec:
                setattr(self, attr,
                        _ini_int(sec.get(key), _INI_DEFAULTS[key]))
        for key, attr in _FLOAT_OPTS.items():
            if key in sec:
                setattr(self, attr,
                        _ini_float(sec.get(key), _INI_DEFAULTS[key]))
        if "enable-cors" in sec:
            self.enable_cors = _ini_bool(sec.get("enable-cors"), False)

    # -- layer 3: command line (include/config.h:324-401) ---------------

    def load_cmd_args(self, given: dict[str, object]) -> None:
        """``given`` holds only the options the user EXPLICITLY passed
        (cmdline::parser::exist semantics — a defaulted option is
        absent), keyed by the reference's dashed option names."""
        for key, attr in _STR_OPTS.items():
            if key in given:
                setattr(self, attr, str(given[key]))
        for key, attr in _INT_OPTS.items():
            if key in given:
                setattr(self, attr, int(given[key]))  # type: ignore[arg-type]
        for key, attr in _FLOAT_OPTS.items():
            if key in given:
                setattr(self, attr, float(given[key]))  # type: ignore[arg-type]
        if given.get("enable-cors"):
            # flag: presence sets True, absence leaves earlier layers
            self.enable_cors = True

    # -- validation (include/config.h:404-415) ---------------------------

    def is_valid(self) -> tuple[bool, str]:
        if self.config_file_validity == -1:
            return False, "Error parsing the configuration file."
        if not self.data_dir:
            return False, "Data directory is not specified."
        if not self.api_key:
            return False, "API key is not specified."
        return True, ""


def resolve_server_config(
    cmd_args: dict[str, object],
    env: dict[str, str] | None = None,
) -> ServerConfig:
    """The server binary's startup sequence (test/config_test.cpp:146-160):
    env first, then the ``--config`` file, then explicit command-line
    args — each layer overriding the previous."""
    cfg = ServerConfig()
    cfg.load_env(env)
    cfg.load_file(str(cmd_args["config"]) if cmd_args.get("config") else None)
    cfg.load_cmd_args(cmd_args)
    return cfg
