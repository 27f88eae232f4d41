"""Git providers: GitHub, GitLab, Bitbucket, Gitea (reference: src/providers/).

Host-side plumbing (auth, repository model, webhook verification, rate
limiting, REST clients). The dead orphan files in the reference
(provider.rs/auth.rs/webhook.rs, never declared in mod.rs) are deliberately
not replicated (SURVEY.md §2.3).
"""

from islands_tpu.providers.base import (
    ApiError,
    AuthenticationError,
    AuthType,
    ConfigurationError,
    GitProvider,
    InvalidWebhookSignature,
    ProviderAuth,
    ProviderConfig,
    ProviderError,
    RateLimiter,
    RateLimitExceeded,
    Repository,
    RepositoryNotFound,
    WebhookEvent,
    WebhookParseError,
    verify_hmac_signature,
)
from islands_tpu.providers.bitbucket import BitbucketProvider
from islands_tpu.providers.factory import (
    ProviderFactory,
    ProviderType,
    create_provider,
    detect_provider,
    parse_repo_url,
)
from islands_tpu.providers.gitea import GiteaProvider
from islands_tpu.providers.github import GitHubProvider
from islands_tpu.providers.gitlab import GitLabProvider

__all__ = [
    "ApiError", "AuthType", "AuthenticationError", "BitbucketProvider",
    "ConfigurationError", "GitHubProvider", "GitLabProvider", "GitProvider",
    "GiteaProvider", "InvalidWebhookSignature", "ProviderAuth",
    "ProviderConfig", "ProviderError", "ProviderFactory", "ProviderType",
    "RateLimitExceeded", "RateLimiter", "Repository", "RepositoryNotFound",
    "WebhookEvent", "WebhookParseError", "create_provider", "detect_provider",
    "parse_repo_url", "verify_hmac_signature",
]
