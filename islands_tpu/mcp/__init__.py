"""MCP stdio server (reference: src/mcp/): JSON-RPC 2.0 protocol, tool
registry, line-delimited stdio loop."""

from islands_tpu.mcp.protocol import (
    JSONRPC_VERSION,
    MCP_PROTOCOL_VERSION,
    JsonRpcRequest,
    Tool,
    make_error,
    make_response,
    text_content,
    tool_result,
)
from islands_tpu.mcp.server import McpServer, run_server
from islands_tpu.mcp.tools import IslandsTools, ToolNotFound

__all__ = [
    "IslandsTools", "JSONRPC_VERSION", "JsonRpcRequest",
    "MCP_PROTOCOL_VERSION", "McpServer", "Tool", "ToolNotFound",
    "make_error", "make_response", "run_server", "text_content", "tool_result",
]
