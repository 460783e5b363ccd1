"""T10-T12 / T14-T15: the scripted REPL layer over the Spark engine.

Semantics mirrored from /root/reference/src/wikicrawler/arbiter/
(script.py, prompt.py, oracle.py, seer.py, utils/search.py) — see
wikicrawler_spark/session.py's module docstring for the line map.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wikicrawler_spark import corpus
from wikicrawler_spark.kernel import extract_spans
from wikicrawler_spark.session import WikiSession


@pytest.fixture(scope="module")
def spans(spark):
    return extract_spans(corpus.corpus_df(spark, 120)).cache()


@pytest.fixture()
def session(spark, spans, tmp_path):
    return WikiSession(spark, spans, state_dir=str(tmp_path))


def _a_title(spans):
    from pyspark.sql import functions as F

    row = (spans.select("doc_id", F.inline("spans"))
           .filter(F.col("kind") == "title")
           .orderBy("doc_id").limit(1).collect()[0])
    return row["doc_id"], row["text"]


def test_search_single_result_analyzes_and_selects(session, spans):
    doc_id, title = _a_title(spans)
    session.parse_cmd(f"s {title}")
    assert session.pointer["selection"] == title
    page = session.crawl_state["pages"][title]
    assert page["doc_id"] == doc_id
    assert page["stats"]["frequencies"]  # non-empty rank-ordered pairs
    assert session.crawl_state["page_stack"] == [title]
    assert session.crawl_state["last_search"][0]["via"] == "direct"


def test_u_command_validates_doc_ids(session, spans):
    doc_id, title = _a_title(spans)
    session.parse_cmd("u not a doc id!")
    assert "Invalid Wikipedia url." in session.output
    session.parse_cmd(f"u {doc_id}")
    assert session.pointer["selection"] == title


def test_print_results_format_and_state_listing(session, spans):
    """T14: utils/search.py '\\ti: label' rows."""
    doc_id, title = _a_title(spans)
    session.parse_cmd(f"u {doc_id}")
    session.output.clear()
    session.parse_cmd("st freq")
    assert session.output, "st freq should list frequencies"
    for i, line in enumerate(session.output):
        assert line.startswith(f"\t{i}: ")


def test_colloc_freq_pointers_and_pointer_search(session, spans):
    doc_id, title = _a_title(spans)
    session.parse_cmd(f"u {doc_id}")
    page = session.crawl_state["pages"][title]
    top_tok = page["stats"]["frequencies"][0][0]
    session.parse_cmd(f"st freq {top_tok}")
    # exact token present -> jw==1.0 -> pointer is that token
    assert session.pointer["most_similar_freq"] == top_tok
    session.parse_cmd("s most_similar_freq")
    assert session.crawl_state["last_search"] is not None


def test_found_and_hist_and_pop_unpop(session, spans):
    doc_id, title = _a_title(spans)
    session.parse_cmd(f"s {title}")
    session.parse_cmd("st found 0")   # re-analyze the single hit
    assert session.crawl_state["page_stack"].count(title) == 2
    session.parse_cmd("st pop")
    assert session.crawl_state["pop_stack"] == [title]
    session.parse_cmd("st unpop")
    assert session.crawl_state["page_stack"].count(title) == 2
    session.output.clear()
    session.parse_cmd("st current")
    assert session.output == [title]


def test_cmov_is_a_script_over_base_commands(session, spans):
    """oracle.py:81-87: cmov == [st colloc P, s most_similar_colloc,
    st found n]."""
    doc_id, title = _a_title(spans)
    session.parse_cmd(f"u {doc_id}")
    page = session.crawl_state["pages"][title]
    if not page["stats"]["collocations"]:
        pytest.skip("doc has no collocations")
    probe = " ".join(page["stats"]["collocations"][0])
    session.parse_cmd(f"o cmov 0 {probe}")
    assert session.pointer["most_similar_colloc"] == probe
    assert session.crawl_state["last_search"] is not None


def test_autosearch_hops(session, spans):
    doc_id, title = _a_title(spans)
    session.parse_cmd(f"o as 2 {title}")
    # seed page analyzed via 'st found 0', then one delayed cmov hop ran
    assert title in session.crawl_state["pages"]
    assert len(session.crawl_state["user_choice_stack"]) >= 1


def test_newf_script_define_and_run(session, spans):
    """T12: newf collects lines until 'end' (script.py:116-136); the
    stored function replays through the engine."""
    doc_id, title = _a_title(spans)
    session.run_script(f"newf go\nu {doc_id}\nst current\nend")
    assert session.functions["go"] == [f"u {doc_id}", "st current"]
    assert session.pointer["selection"] is None  # define != run
    session.run_function("go")
    assert session.pointer["selection"] == title


def test_state_save_load_roundtrip(session, spark, spans, tmp_path):
    doc_id, title = _a_title(spans)
    session.parse_cmd(f"u {doc_id}")
    session.parse_cmd("st save")
    fresh = WikiSession(spark, spans, state_dir=str(tmp_path))
    assert fresh.pointer["selection"] == title
    assert title in fresh.crawl_state["pages"]
    assert fresh.crawl_state["last_search"] is None  # cleared on save


def test_seer_build_writes_reference_shaped_markdown(session, spans, tmp_path):
    doc_id, title = _a_title(spans)
    session.parse_cmd(f"u {doc_id}")
    session.parse_cmd("seer build")
    safe = title.translate(str.maketrans("", "", ":"))
    path = tmp_path / "markdown" / title / f"{safe}.md"
    assert path.exists()
    content = path.read_text()
    assert content.startswith(f"# {title}\n")
    assert "## Paragraphs" in content and "## Stats" in content


def test_sents_sticky_endpoints(session, spans):
    doc_id, title = _a_title(spans)
    session.parse_cmd(f"u {doc_id}")
    session.parse_cmd("st sents 0 2")
    first = list(session.pointer["selected_text"])
    assert len(first) <= 2
    session.output.clear()
    session.parse_cmd("st sents - -")   # sticky: same slice
    assert list(session.pointer["selected_text"]) == first


def test_show_emits_summary_slices(session, spans):
    doc_id, title = _a_title(spans)
    session.parse_cmd(f"u {doc_id}")
    session.output.clear()
    session.parse_cmd("st show")
    assert session.output  # first5/pivot/last5 sentences


def test_unknown_command_reports(session):
    assert session.parse_cmd("frobnicate") is False
    assert session.output[-1] == "Unknown command: frobnicate"


def test_empty_stack_pop_unpop_and_bad_sents_do_not_abort(session, spans):
    """ADVICE r4: 'st pop' on an empty page_stack, 'st unpop' on an empty
    pop_stack, and 'st sents <non-int>' must emit error lines (like the
    sa/links/found branches) instead of raising out of parse_cmd and
    killing the whole script."""
    doc_id, title = _a_title(spans)
    session.parse_cmd(f"s {title}")       # page_stack == [title]
    session.parse_cmd("st unpop")         # pop_stack is empty
    assert any("pop stack is empty" in line for line in session.output)
    session.parse_cmd("st pop")           # legit pop -> stack now empty
    session.parse_cmd("st pop")           # second pop: empty page_stack
    assert any("page stack is empty" in line for line in session.output)
    session.parse_cmd("st sents zero five")
    assert any("bad range" in line for line in session.output)
    # and the session is still usable afterwards
    session.parse_cmd("st unpop")
    assert session.crawl_state["page_stack"] == [title]
