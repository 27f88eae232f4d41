"""Q&A agent (reference: src/agent/): search-first RAG over the indexer."""

from islands_tpu.agent.llm import (
    ContextTooLong,
    LlmConfig,
    LlmError,
    LlmProvider,
    Message,
    MockLlmProvider,
    OpenAiProvider,
)
from islands_tpu.agent.prompt import (
    DEFAULT_SYSTEM_PROMPT,
    build_messages,
    format_search_context,
)
from islands_tpu.agent.service import IslandsAgent

__all__ = [
    "ContextTooLong", "DEFAULT_SYSTEM_PROMPT", "IslandsAgent", "LlmConfig",
    "LlmError", "LlmProvider", "Message", "MockLlmProvider", "OpenAiProvider",
    "build_messages", "format_search_context",
]
