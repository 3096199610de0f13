"""API-key management + HMAC scoped search keys: the reference's
``api_key_t`` / ``AuthManager`` surface (``include/auth_manager.h:10-130``,
``src/auth_manager.cpp:1-341``) rebuilt without the HTTP layer.

What a user of the reference can do here:

- create / get / list / remove API keys with auto-incrementing ids,
  per-key ``actions`` + ``collections`` scopes (exact, ``*`` and regex
  collection patterns) and expiry timestamps; key values are truncated
  to their 4-char prefix on read-back exactly like the reference
  (``api_key_t::truncate_value``).
- validate key-definition JSON with the reference's exact error strings
  (``api_key_t::validate``, src/auth_manager.cpp:286-341).
- authenticate a request key against (action, collection) —
  ``AuthManager::authenticate`` (src/auth_manager.cpp:133-173): plain
  keys go through the action/collection scope matrix; anything longer
  than ``KEY_LEN`` is treated as a scoped key.
- scoped API keys: ``base64(HMAC_b64 ++ parent_prefix ++ params_json)``
  (``AuthManager::authenticate_parse_params``,
  src/auth_manager.cpp:214-280). Verification walks stored keys in
  sorted value order (the reference's ``std::map`` iteration), requires
  the parent to allow ONLY ``documents:search``, verifies the
  HMAC-SHA256 digest, enforces ``min(parent, embedded)`` expiry, and
  merges the embedded params into the request params —
  ``filter_by`` composes with ``&&``, everything else overrides, and
  ``expires_at`` never leaks into the search params.
  Golden scoped-key blobs from ``test/auth_manager_test.cpp:218-299``
  verify byte-for-byte in ``tests/test_reference_auth.py``.

Persistence mirrors the reference's RocksDB store with a JSON state
file (``keys.json``) per state dir: ``AuthManager.init`` is idempotent
and a fresh manager pointed at the same dir restores every key
(``AuthManagerTest.CheckRestoreOfAPIKeys``).

Scale note: keys are driver-side metadata (a handful of rows), never
shipped per batch — ``authenticate`` returns the enriched param dict
that callers pass to ``RayCollection.search``; the distributed query
path is untouched. Pure stdlib (``hmac``/``hashlib``/``base64``).

Divergences (documented):

- ``list_keys`` orders by numeric id; the reference's lexicographic
  store scan only differs at >9 keys (``$KP_10`` < ``$KP_2``).
- non-string embedded param values stay native Python values instead of
  going through nlohmann's string conversion.
- no HTTP route → action derivation (``route_path::_get_action``):
  callers name actions directly (``"documents:search"`` etc.).
"""

from __future__ import annotations

import base64
import hashlib
import hmac as _hmac
import json
import os
import re
import time

from typesense_ray.errors import DocumentError

FAR_FUTURE_TIMESTAMP = 64723363199  # year 4020 (include/auth_manager.h:19)
PREFIX_LEN = 4
KEY_LEN = 32
HMAC_BASE64_LEN = 44  # base64 of a 32-byte SHA-256 digest
DOCUMENTS_SEARCH_ACTION = "documents:search"


def hmac_b64(key: str, msg: str) -> str:
    """``StringUtils::hmac`` (src/string_utils.cpp:86-95): base64 of the
    raw HMAC-SHA256 digest."""
    digest = _hmac.new(key.encode(), msg.encode(), hashlib.sha256).digest()
    return base64.b64encode(digest).decode()


class ApiKey:
    """``api_key_t`` (include/auth_manager.h:10-75)."""

    def __init__(self, value: str, description: str, actions: list[str],
                 collections: list[str],
                 expires_at: int = FAR_FUTURE_TIMESTAMP, key_id: int = 0):
        self.id = key_id
        self.value = value
        self.description = description
        self.actions = list(actions)
        self.collections = list(collections)
        self.expires_at = expires_at

    def to_json(self) -> dict:
        return {
            "id": self.id,
            "value": self.value,
            "description": self.description,
            "actions": self.actions,
            "collections": self.collections,
            "expires_at": self.expires_at,
        }

    @classmethod
    def from_json(cls, obj: dict) -> "ApiKey":
        """``api_key_t::load`` — ``expires_at`` is the only optional
        field (defaults far-future)."""
        return cls(
            obj["value"], obj["description"], obj["actions"],
            obj["collections"],
            obj.get("expires_at", FAR_FUTURE_TIMESTAMP), obj["id"],
        )

    def truncated(self) -> "ApiKey":
        """``truncate_value`` — expose only the 4-char prefix."""
        return ApiKey(self.value[:PREFIX_LEN], self.description,
                      self.actions, self.collections, self.expires_at,
                      self.id)

    @staticmethod
    def validate(key_obj: dict) -> None:
        """``api_key_t::validate`` (src/auth_manager.cpp:286-341): the
        reference's check order and exact error strings; raises
        :class:`DocumentError` (400) on the first violation."""
        for key in ("description", "actions", "collections"):
            if key not in key_obj:
                raise DocumentError(
                    400, f"Could not find a `{key}` key.")
        actions = key_obj["actions"]
        collections = key_obj["collections"]
        actions_err = DocumentError(
            400, "Wrong format for `actions`. It should be an array of "
                 "string.")
        collections_err = DocumentError(
            400, "Wrong format for `collections`. It should be an array "
                 "of string.")
        if not isinstance(actions, list) or not actions:
            raise actions_err
        if not isinstance(collections, list) or not collections:
            raise collections_err
        for item in actions:
            if not isinstance(item, str):
                raise actions_err
        for item in collections:
            if not isinstance(item, str):
                raise collections_err
        if "expires_at" in key_obj:
            ea = key_obj["expires_at"]
            if not isinstance(ea, int) or isinstance(ea, bool) or ea < 0:
                raise DocumentError(
                    400, "Wrong format for `expires_at`. It should be an "
                         "unsigned integer.")
        # beyond the reference (which ignores client-supplied values and
        # always generates the key server-side, src/core_api.cpp
        # post_create_key): this port honors an explicit `value`, so it
        # must be a string — a numeric value would poison key listing
        # and scoped-key candidate walks with TypeErrors
        if "value" in key_obj and not isinstance(key_obj["value"], str):
            raise DocumentError(
                400, "Wrong format for `value`. It should be a string.")
        if "value" in key_obj and len(key_obj["value"]) > KEY_LEN:
            # authenticate() treats anything longer than KEY_LEN as a
            # scoped HMAC key, so a longer stored value could never
            # authenticate — reject at creation instead
            raise DocumentError(
                400, f"Wrong format for `value`. It should be a string "
                     f"of at most {KEY_LEN} characters.")


class AuthManager:
    """``AuthManager`` (src/auth_manager.cpp): key CRUD + request
    authentication. ``state_dir=None`` keeps keys in memory only."""

    _STATE_FILE = "keys.json"

    def __init__(self, state_dir: str | None = None):
        self._keys: dict[str, ApiKey] = {}  # value -> key (std::map role)
        self._next_id = 0
        self.state_dir = state_dir
        self.init(state_dir)

    # -- persistence ---------------------------------------------------

    def init(self, state_dir: str | None) -> None:
        """Idempotent (re)load from the state dir, like
        ``AuthManager::init`` re-scanning the store."""
        self.state_dir = state_dir
        self._keys = {}
        self._next_id = 0
        if state_dir is None:
            return
        path = os.path.join(state_dir, self._STATE_FILE)
        if not os.path.exists(path):
            return
        with open(path) as f:
            state = json.load(f)
        self._next_id = state["next_id"]
        for obj in state["keys"]:
            key = ApiKey.from_json(obj)
            self._keys[key.value] = key

    def _persist(self) -> None:
        if self.state_dir is None:
            return
        os.makedirs(self.state_dir, exist_ok=True)
        path = os.path.join(self.state_dir, self._STATE_FILE)
        tmp = path + ".tmp"
        keys = sorted(self._keys.values(), key=lambda k: k.id)
        with open(tmp, "w") as f:
            json.dump(
                {"next_id": self._next_id,
                 "keys": [k.to_json() for k in keys]}, f)
        os.replace(tmp, path)

    # -- CRUD ------------------------------------------------------------

    def create_key(self, api_key: ApiKey) -> ApiKey:
        """409 on a duplicate key value; assigns the next id."""
        if api_key.value in self._keys:
            raise DocumentError(409, "API key generation conflict.")
        api_key.id = self._next_id
        self._next_id += 1
        self._keys[api_key.value] = api_key
        self._persist()
        return api_key

    def _find(self, key_id: int) -> ApiKey | None:
        for key in self._keys.values():
            if key.id == key_id:
                return key
        return None

    def get_key(self, key_id: int, truncate_value: bool = True) -> ApiKey:
        key = self._find(key_id)
        if key is None:
            raise DocumentError(404, "Not found.")
        return key.truncated() if truncate_value else key

    def has_keys(self) -> bool:
        """True when any key is configured — the facade's open-mode
        check, without reaching into the private store."""
        return bool(self._keys)

    def list_keys(self) -> list[ApiKey]:
        return [k.truncated()
                for k in sorted(self._keys.values(), key=lambda k: k.id)]

    def remove_key(self, key_id: int) -> ApiKey:
        key = self._find(key_id)
        if key is None:
            # the reference wraps the get-miss as a 500
            # (src/auth_manager.cpp:112-115)
            raise DocumentError(500, "Not found.")
        del self._keys[key.value]
        self._persist()
        return key.truncated()

    # -- authentication ----------------------------------------------------

    def auth_against_key(self, collection: str, action: str,
                         api_key: ApiKey, search_only: bool) -> bool:
        """``AuthManager::auth_against_key``
        (src/auth_manager.cpp:175-212): expiry, then the action scope
        (scoped parents must allow ONLY ``documents:search``), then the
        collection scope — exact, ``*``, empty-collection pass, or a
        full-string regex match."""
        if time.time() > api_key.expires_at:
            return False
        if search_only:
            if api_key.actions != [DOCUMENTS_SEARCH_ACTION]:
                return False
        else:
            if not any(a == "*" or (action != "*" and a == action)
                       for a in api_key.actions):
                return False
        for allowed in api_key.collections:
            if allowed == "*" or allowed == collection or collection == "":
                return True
            try:
                if re.fullmatch(allowed, collection):
                    return True
            except re.error:
                continue
        return False

    def authenticate_parse_params(self, scoped_api_key: str, action: str,
                                  collection: str) -> dict:
        """``AuthManager::authenticate_parse_params``
        (src/auth_manager.cpp:214-280): returns the embedded params dict
        or raises ``DocumentError(403, "Forbidden.")``. Walks candidate
        parent keys in sorted value order (std::map iteration); a
        prefix-matching parent that fails the collection/action scope
        rejects immediately, while an HMAC mismatch moves on to the next
        candidate."""
        forbidden = DocumentError(403, "Forbidden.")
        if action != DOCUMENTS_SEARCH_ACTION:
            raise forbidden
        try:
            payload = base64.b64decode(scoped_api_key).decode()
        except Exception:
            raise forbidden from None
        digest = payload[:HMAC_BASE64_LEN]
        prefix = payload[HMAC_BASE64_LEN:HMAC_BASE64_LEN + PREFIX_LEN]
        custom_params = payload[HMAC_BASE64_LEN + PREFIX_LEN:]
        for value in sorted(self._keys):
            if value[:PREFIX_LEN] != prefix:
                continue
            api_key = self._keys[value]
            if not self.auth_against_key(collection, action, api_key,
                                         search_only=True):
                raise forbidden
            # compare as BYTES: compare_digest raises TypeError on
            # non-ASCII str input, and a crafted key with a non-ASCII
            # digest must be a clean 403, not a request-thread crash
            if not _hmac.compare_digest(
                    hmac_b64(value, custom_params).encode(),
                    digest.encode()):
                continue
            try:
                embedded = json.loads(custom_params)
            except Exception:
                raise forbidden from None
            if not isinstance(embedded, dict):
                raise forbidden
            if "expires_at" in embedded:
                ea = embedded["expires_at"]
                if (not isinstance(ea, int) or isinstance(ea, bool)
                        or ea < 0):
                    raise forbidden
                # parent expiry always takes precedence
                if time.time() > min(api_key.expires_at, ea):
                    raise forbidden
            return embedded
        raise forbidden

    def authenticate(self, req_api_key: str, action: str, collection: str,
                     params: dict) -> bool:
        """``AuthManager::authenticate`` (src/auth_manager.cpp:133-173).
        Scoped keys (longer than ``KEY_LEN``) verify and merge their
        embedded params into ``params`` IN PLACE: absent keys are set,
        ``filter_by`` composes as ``request && embedded``, other
        collisions take the embedded value, ``expires_at`` is skipped."""
        if len(req_api_key) > KEY_LEN:
            try:
                embedded = self.authenticate_parse_params(
                    req_api_key, action, collection)
            except DocumentError:
                return False
            for k, v in embedded.items():
                if k == "expires_at":
                    continue
                if k not in params:
                    params[k] = v
                elif k == "filter_by":
                    params[k] = f"{params[k]}&&{v}"
                else:
                    params[k] = v
            return True
        api_key = self._keys.get(req_api_key)
        if api_key is None:
            return False
        return self.auth_against_key(collection, action, api_key,
                                     search_only=False)


def generate_scoped_key(parent_key_value: str, params: dict) -> str:
    """Client-side scoped-key generation (the reference documents this
    as ``base64(HMAC ++ key_prefix ++ params_json)`` — the server only
    verifies). Any JSON encoding works because the HMAC covers the
    exact serialized string embedded in the key."""
    custom_params = json.dumps(params)
    payload = (hmac_b64(parent_key_value, custom_params)
               + parent_key_value[:PREFIX_LEN] + custom_params)
    return base64.b64encode(payload.encode()).decode()
