"""Credential validation seam — parity for the reference's auth layer.

The reference authenticates Flight clients with HTTP basic auth: a
``Basic base64(user:pass)`` header validated either against Neo4j's
AuthManager (``plugin/src/main/java/org/neo4j/arrow/auth/
NativeAuthValidator.java:27-121``) or a hard-coded dev fallback
(``src/main/java/org/neo4j/arrow/action/auth/
HorribleBasicAuthValidator.java``); the authenticated username then
becomes the peer identity that keys catalog authorization.

In this engine the "wire" is the SparkSession, so authentication is a
construction-time seam rather than a per-request header: a
:class:`BasicAuthValidator` checks ``(user, password)`` (or the same
base64 token format the reference ships) and hands back the identity
that :class:`~neo4j_arrow_spark.api.Neo4jArrowSpark` uses as its
catalog key. Swap in your real identity provider by subclassing
:class:`AuthValidator` — exactly the reference's validator interface.
"""

from __future__ import annotations

import base64
import hmac

__all__ = ["AuthError", "AuthValidator", "BasicAuthValidator"]


class AuthError(ValueError):
    pass


class AuthValidator:
    """Validator interface (``BasicAuthValidator.validate`` in the
    reference): map credentials to an authenticated username or raise
    :class:`AuthError`."""

    def validate(self, username: str, password: str) -> str:
        raise NotImplementedError

    def validate_token(self, token: str) -> str:
        """``base64(user:pass)`` token form — the wire encoding of the
        reference's basic-auth header (NativeAuthValidator builds the
        same token back for its context map)."""
        try:
            decoded = base64.b64decode(token, validate=True).decode("utf-8")
            user, _, password = decoded.partition(":")
        except Exception as exc:  # malformed base64 / not utf-8
            raise AuthError("malformed basic-auth token") from exc
        if not _:
            raise AuthError("malformed basic-auth token (no ':' separator)")
        return self.validate(user, password)


class BasicAuthValidator(AuthValidator):
    """In-memory credential map — the ``HorribleBasicAuthValidator``
    analogue (it hard-codes ``neo4j/password``), generalized to any
    user->password dict. Comparison is constant-time
    (``hmac.compare_digest``); failures never reveal whether the user
    or the password was wrong."""

    def __init__(self, credentials: dict[str, str]):
        self._creds = dict(credentials)

    def validate(self, username: str, password: str) -> str:
        expected = self._creds.get(username)
        # compare against a dummy for unknown users so timing does not
        # distinguish bad-user from bad-password
        ok = hmac.compare_digest(password, expected if expected is not None else "\x00")
        if expected is None or not ok:
            raise AuthError("invalid credentials")
        return username
