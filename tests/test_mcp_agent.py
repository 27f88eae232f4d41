"""MCP server + agent tests.

MCP: full request/response protocol through handle_request with an in-memory
indexer — initialize / tools-list / tools-call / unknown-method / shutdown
(reference: src/mcp/server.rs:177-450). Agent: MockLlmProvider RAG flow
(reference: src/agent/service.rs:143-178+).
"""

import io
import json

import pytest

from islands_tpu.agent import (
    DEFAULT_SYSTEM_PROMPT,
    IslandsAgent,
    LlmError,
    Message,
    MockLlmProvider,
    OpenAiProvider,
    build_messages,
    format_search_context,
)
from islands_tpu.indexer import IndexerConfig, IndexerService
from islands_tpu.mcp import McpServer
from islands_tpu.mcp.protocol import METHOD_NOT_FOUND, PARSE_ERROR


@pytest.fixture
def svc(tmp_path):
    svc = IndexerService(IndexerConfig(base_path=str(tmp_path / "islands")))
    src = tmp_path / "proj"
    (src / "src").mkdir(parents=True)
    (src / "src" / "engine.py").write_text(
        "def beam_search(query, graph):\n    return graph.search(query)\n"
    )
    (src / "README.md").write_text("# proj\nvector search engine\n")
    svc.index_local_path(src, "proj")
    return svc


@pytest.fixture
def server(svc):
    return McpServer(svc)


def rpc(server, method, params=None, id=1):
    line = json.dumps(
        {"jsonrpc": "2.0", "id": id, "method": method,
         **({"params": params} if params is not None else {})}
    )
    out = server.handle_line(line)
    return json.loads(out) if out is not None else None


class TestMcpProtocol:
    def test_initialize(self, server):
        resp = rpc(server, "initialize", {"protocolVersion": "2024-11-05"})
        assert resp["id"] == 1
        r = resp["result"]
        assert r["protocolVersion"] == "2024-11-05"
        assert r["serverInfo"]["name"] == "islands-tpu"
        assert "tools" in r["capabilities"]

    def test_initialized_notification_no_response(self, server):
        line = json.dumps({"jsonrpc": "2.0", "method": "initialized"})
        assert server.handle_line(line) is None

    def test_tools_list(self, server):
        resp = rpc(server, "tools/list")
        tools = {t["name"] for t in resp["result"]["tools"]}
        assert tools == {
            "islands_list", "islands_search", "islands_add_repo",
            "islands_sync", "islands_status", "islands_remove",
        }
        for t in resp["result"]["tools"]:
            assert "inputSchema" in t and t["inputSchema"]["type"] == "object"

    def test_unknown_method(self, server):
        resp = rpc(server, "nope/nothing")
        assert resp["error"]["code"] == METHOD_NOT_FOUND

    def test_parse_error(self, server):
        out = server.handle_line("{not json")
        assert json.loads(out)["error"]["code"] == PARSE_ERROR

    def test_invalid_request(self, server):
        out = server.handle_line(json.dumps({"jsonrpc": "1.0", "id": 1}))
        assert "error" in json.loads(out)

    def test_shutdown(self, server):
        resp = rpc(server, "shutdown")
        assert resp["result"] is None
        assert server._shutdown

    def test_stdio_loop(self, svc):
        server = McpServer(svc)
        stdin = io.StringIO(
            json.dumps({"jsonrpc": "2.0", "id": 1, "method": "initialize"}) + "\n"
            + json.dumps({"jsonrpc": "2.0", "method": "initialized"}) + "\n"
            + json.dumps({"jsonrpc": "2.0", "id": 2, "method": "tools/list"}) + "\n"
            + json.dumps({"jsonrpc": "2.0", "id": 3, "method": "shutdown"}) + "\n"
            + json.dumps({"jsonrpc": "2.0", "id": 4, "method": "tools/list"}) + "\n"
        )
        stdout = io.StringIO()
        server.run_stdio(stdin, stdout)
        lines = [json.loads(l) for l in stdout.getvalue().splitlines()]
        # shutdown stops the loop: id=4 never answered
        assert [l["id"] for l in lines] == [1, 2, 3]


class TestMcpTools:
    def _content_text(self, resp):
        return resp["result"]["content"][0]["text"]

    def test_list(self, server):
        resp = rpc(server, "tools/call", {"name": "islands_list"})
        assert "proj" in self._content_text(resp)

    def test_search(self, server):
        resp = rpc(server, "tools/call", {
            "name": "islands_search",
            "arguments": {"query": "beam search engine", "top_k": 3},
        })
        text = self._content_text(resp)
        assert "engine.py" in text or "README.md" in text
        assert not resp["result"].get("isError")

    def test_search_missing_query_is_tool_error(self, server):
        resp = rpc(server, "tools/call", {"name": "islands_search", "arguments": {}})
        # tool errors are SUCCESS with isError (reference: server.rs:150-165)
        assert "error" not in resp
        assert resp["result"]["isError"] is True

    def test_status_all_and_single(self, server):
        resp = rpc(server, "tools/call", {"name": "islands_status"})
        data = json.loads(self._content_text(resp))
        assert data["num_indexes"] == 1
        resp = rpc(server, "tools/call", {
            "name": "islands_status", "arguments": {"index_name": "proj"},
        })
        assert json.loads(self._content_text(resp))["name"] == "proj"

    def test_remove_and_unknown_tool(self, server):
        resp = rpc(server, "tools/call", {
            "name": "islands_remove", "arguments": {"index_name": "proj"},
        })
        assert "Removed" in self._content_text(resp)
        resp = rpc(server, "tools/call", {"name": "islands_nope"})
        assert resp["error"]["code"] == METHOD_NOT_FOUND

    def test_tool_error_on_missing_index(self, server):
        resp = rpc(server, "tools/call", {
            "name": "islands_sync", "arguments": {"index_name": "ghost"},
        })
        assert resp["result"]["isError"] is True


class TestPrompt:
    def test_format_context_top5_truncated(self):
        results = [
            {"path": f"f{i}.py", "start_line": i, "snippet": "x" * 2000, "score": 0.9}
            for i in range(8)
        ]
        ctx = format_search_context(results)
        assert ctx.count("---") == 2 * 5  # top 5 only
        assert "x" * 1001 not in ctx  # 1000-char truncate

    def test_format_empty(self):
        assert "No relevant code" in format_search_context([])

    def test_build_messages_structure(self):
        history = [Message.user(f"q{i}") for i in range(15)]
        msgs = build_messages("question", "CTX", history)
        assert msgs[0].role == "system" and msgs[0].content == DEFAULT_SYSTEM_PROMPT
        hist_msgs = [m for m in msgs if m.content.startswith("q") and m.content != "question"]
        assert len(hist_msgs) == 10  # last 10 of history
        assert msgs[-2].content == "CTX" and msgs[-2].role == "system"
        assert msgs[-1] == Message.user("question")


class TestAgent:
    def test_ask_flow(self, svc):
        llm = MockLlmProvider(["The beam_search function searches the graph."])
        agent = IslandsAgent(svc, llm)
        answer = agent.ask("what does beam_search do?")
        assert "beam_search" in answer
        # LLM received system + context + question
        sent = llm.calls[0]
        assert sent[0].role == "system"
        assert any("engine.py" in m.content for m in sent)  # search context
        assert sent[-1].content == "what does beam_search do?"
        # history recorded
        assert len(agent.history) == 2

    def test_history_window(self, svc):
        llm = MockLlmProvider(["ok"])
        agent = IslandsAgent(svc, llm)
        for i in range(12):
            agent.ask(f"question {i}")
        # later calls include only last-10 history
        last_call = llm.calls[-1]
        hist = [m for m in last_call if m.content.startswith(("question", "ok"))]
        assert len(hist) <= 10 + 1  # 10 history + current question

    def test_ask_stream(self, svc):
        llm = MockLlmProvider(["streamed answer here"])
        agent = IslandsAgent(svc, llm)
        chunks = list(agent.ask_stream("q"))
        assert "".join(chunks).strip() == "streamed answer here"
        assert agent.history[-1].role == "assistant"

    def test_clear_history(self, svc):
        agent = IslandsAgent(svc, MockLlmProvider())
        agent.ask("q")
        agent.clear_history()
        assert agent.history == []

    def test_openai_requires_key(self):
        from islands_tpu.agent import LlmConfig

        with pytest.raises(LlmError):
            OpenAiProvider(LlmConfig(api_key=None))


class TestReviewRegressions:
    def test_non_object_json_returns_invalid_request(self, server):
        out = server.handle_line("[1, 2, 3]")
        resp = json.loads(out)
        assert resp["error"]["code"] == -32600

    def test_agent_gets_full_snippets(self, svc):
        """The agent requests SNIPPET_LIMIT-char snippets, not the 200-char
        CLI default."""
        from islands_tpu.agent.prompt import SNIPPET_LIMIT

        seen = {}
        orig = svc.search

        def spy(*a, **kw):
            seen.update(kw)
            return orig(*a, **kw)

        svc.search = spy
        agent = IslandsAgent(svc, MockLlmProvider())
        agent.ask("anything")
        assert seen.get("snippet_chars") == SNIPPET_LIMIT
