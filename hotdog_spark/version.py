"""Engine version, exposed to rule templates as ``{{version}}``.

Mirrors the reference's use of ``env!["CARGO_PKG_VERSION"]`` as the
``version`` template variable (reference: src/connection.rs:156).
"""

ENGINE_VERSION = "0.1.0"
