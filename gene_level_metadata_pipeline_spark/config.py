"""Pipeline configuration: secrets from the environment, versions pinned
in code (SURVEY.md §2.13 E2).

The reference keeps its keys as gitignored placeholders and its release
pins as plain variables at the top of the import script
(``scripts/import/temp-import-all-api-ftp.R:16-20`` — ``omim_api_key <-
NA # hidden env / gitignore``, ``lethal_genes_token <- ""``,
``impc_release_version <- "22.1"``, ``g2p_folder_file``,
``panelapp_max``). The engine's equivalent is one frozen config object:
secrets resolve from environment variables at construction time (never
hardcoded, never logged — ``repr`` masks them), release pins are
explicit defaults that a run can override. Spark-side code takes the
VALUES as plain arguments; nothing in an executor ever touches the
environment, so a cluster submit only needs the driver's env.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field, fields


def _env(name: str, default: str | None = None) -> str | None:
    """Placeholder-default env lookup: empty string counts as unset,
    mirroring the reference's ``"" # hidden env / gitignore`` idiom."""
    v = os.environ.get(name, "")
    return v if v != "" else default


@dataclass(frozen=True)
class PipelineConfig:
    """Frozen run configuration.

    Secrets (``omim_api_key``, ``lethal_genes_token``) default to None —
    the pipeline stages that need them (OMIM fetch, lethal-genes API)
    raise a clear error at call time if absent, instead of shipping a
    placeholder into a request. Version pins default to the reference's
    own values (I:16,19,20).
    """

    omim_api_key: str | None = field(
        default_factory=lambda: _env("OMIM_API_KEY")
    )
    lethal_genes_token: str | None = field(
        default_factory=lambda: _env("LETHAL_GENES_TOKEN")
    )
    impc_release_version: str = field(
        default_factory=lambda: _env("IMPC_RELEASE_VERSION", "22.1")
    )
    g2p_folder_file: str = field(
        default_factory=lambda: _env(
            "G2P_FOLDER_FILE", "2025_02_28/DDG2P_2025-02-28.csv.gz"
        )
    )
    panelapp_max: int = field(
        default_factory=lambda: int(_env("PANELAPP_MAX", "338"))
    )

    _SECRETS = ("omim_api_key", "lethal_genes_token")

    def require(self, name: str) -> str:
        """Fetch a secret, raising a configuration error (not a deep
        stack later) when the env var was never provided."""
        v = getattr(self, name)
        if v is None:
            env_name = name.upper()
            raise RuntimeError(
                f"config: {name} is not set; export {env_name} (the "
                "reference keeps it in a gitignored local override, "
                "I:17-18)"
            )
        return v

    def __repr__(self) -> str:  # never leak secrets into logs/tracebacks
        parts = []
        for f in fields(self):
            v = getattr(self, f.name)
            if f.name in self._SECRETS and v is not None:
                v = "***"
            parts.append(f"{f.name}={v!r}")
        return f"PipelineConfig({', '.join(parts)})"
