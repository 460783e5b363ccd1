"""The reference's REPL layer — script engine, command dispatch, pretty
printing — re-expressed over the Spark engine (T10-T12 / T14-T15, the
five SURVEY §2.4 rows previously scoped out as REPL sugar).

Reference semantics (citations to /root/reference/src/wikicrawler/):

  T10 script engine    arbiter/script.py:17-239   WikiScriptEngine:
                       crawl_state / pointer / functions dicts persisted
                       as json, run_script over strings, files, or lists
                       (with callables for delayed evaluation),
                       page/selection/analyze wrappers.
  T11 dispatch         arbiter/prompt.py:359-418  parse_cmd match on
                       ['s'|'u'|'st'|'o'|'oracle'|'seer'|'pointer'|
                        'state'|'newf'|'help'|'exit'], plus the 'st'
                       sub-dispatch (prompt.py:264-356) and the oracle
                       moves, which are themselves SCRIPTS over base
                       commands (oracle.py:68-87: cmov/fmov;
                       oracle.py:37-66: autosearch).
  T12 newf             arbiter/script.py:116-136  cmd_func_init: named
                       command lists stored in the functions cache.
                       (The reference defines and persists functions but
                       never dispatches them — there is no invocation
                       case in parse_cmd; ``run_function`` here is an
                       explicit engine extension, documented as such.)
  T14/T15 pretty-print arbiter/utils/search.py:7-13  print_results'
                       '\\ti: label' rows (cmd.columnize's multi-column
                       layout is terminal cosmetics; one row per line
                       here, deterministic and testable), plus the
                       'pointer'/'state' dumps of prompt.py:400-403.

Spark-first shape: the session drives the SAME engine operators the
batch queries use (traversal.search, analytics word_freq / collocations
/ sentence_slices, similarity.jaro_winkler, sinks.markdown_doc,
sentiment) against the extracted spans table; per-command collects are
single-page REPL results (one doc's stats), never corpus-wide pulls.
State is plain json via sinks.write_state, mirroring the reference's
prompt-dir files (script.py:92-114).
"""

from __future__ import annotations

import os
import re
from typing import Callable, Iterable

from pyspark.sql import DataFrame, functions as F

from . import analytics as A
from .page_view import page_view
from .similarity import jaro_winkler
from .sinks import markdown_doc, read_state, write_state
from .storage import DOC_ID_PATTERN
from .traversal import search as corpus_search

_EMPTY_CRAWL = {"user_choice_stack": [], "page_stack": [], "pop_stack": [],
                "pages": {}, "last_search": None}
_EMPTY_POINTER = {"most_similar_freq": None, "most_similar_colloc": None,
                  "selection": None, "selected_text": None}


class WikiSession:
    """Scripted session over an extracted spans DataFrame.

    ``run_script`` / ``parse_cmd`` accept the reference's command grammar;
    output lines accumulate in ``self.output`` (and echo to stdout when
    ``interactive=True``), state round-trips through ``state_dir`` json.
    """

    def __init__(self, spark, spans_df: DataFrame,
                 state_dir: str | None = None, interactive: bool = False):
        self.spark = spark
        self.spans = spans_df
        self.state_dir = state_dir
        self.interactive = interactive
        self.output: list[str] = []
        # script.py:45,57,70 initial shapes; restored from state_dir when
        # present (script.py:41-70)
        self.crawl_state = {k: (dict(v) if isinstance(v, dict) else
                                (list(v) if isinstance(v, list) else v))
                            for k, v in _EMPTY_CRAWL.items()}
        self.pointer = dict(_EMPTY_POINTER)
        self.functions: dict[str, list[str]] = {}
        self._sents_start: str | None = None
        self._sents_stop: str | None = None
        if state_dir is not None:
            for attr, name in (("crawl_state", "crawl_state"),
                               ("pointer", "pointer"),
                               ("functions", "functions_cache")):
                loaded = read_state(os.path.join(state_dir, name + ".json"))
                if loaded is not None:
                    setattr(self, attr, loaded)

    # ---------------------------------------------------------- printing

    def _emit(self, line: str) -> None:
        self.output.append(line)
        if self.interactive:
            print(line)

    def _print_results(self, results: Iterable) -> None:
        """T14: utils/search.py:7-13 — '\\ti: label' per result; dicts
        label by ['title'], tuples/lists by [0]."""
        for i, r in enumerate(results):
            if isinstance(r, dict):
                label = r.get("title")
            elif isinstance(r, (tuple, list)):
                label = r[0]
            else:
                label = r
            self._emit(f"\t{i}: {label}")

    # ---------------------------------------------------- page analysis

    def _doc_spans(self, doc_id: str) -> list:
        return (self.spans.filter(F.col("doc_id") == doc_id)
                .select(F.inline("spans")).orderBy("offset").collect())

    def _analyze_page(self, doc_id: str) -> dict | None:
        """analyze_page_wrapper (script.py:205-239): compute + cache the
        page's stats, push history, set the selection pointer. One doc's
        rows cross the driver — REPL-scale by definition."""
        one = self.spans.filter(F.col("doc_id") == doc_id)
        rows = page_view(one).collect()
        if not rows:
            return None
        pr = rows[0]
        body = one.select("doc_id", A.body_col(F.col("spans")).alias("body"))
        # rank order pinned like argmax_freq / bigram rank (count desc,
        # token asc / llr desc, words asc) so first-strict-max replays
        # the reference's dict-iteration argmax deterministically
        freqs = [(r["token"], r["cnt"]) for r in
                 A.word_freq(body).orderBy(F.desc("cnt"), "token").collect()]
        collocs = [(r["w1"], r["w2"]) for r in
                   A.bigram_collocations(body)
                   .orderBy("rank", "w1", "w2").collect()]
        # per-paragraph link dicts (grabber's page['paragraph_links']
        # shape): kernel emits each paragraph followed by its links, so
        # group links under the preceding paragraph span
        para_links: list[dict] = []
        current: dict = {}
        for s in self._doc_spans(doc_id):
            if s["kind"] == "paragraph":
                current = {}
                para_links.append(current)
            elif s["kind"] == "link":
                if not para_links:
                    para_links.append(current)
                current[s["text"]] = s["media_ref"]
        page = {
            "doc_id": doc_id,
            "title": pr["title"] if pr["title"] is not None else doc_id,
            "url": pr["url"],
            "paragraphs": list(pr["paragraphs"]),
            "paragraph_links": para_links,
            "see_also": dict(pr["see_also"]),
            "stats": {"frequencies": freqs, "collocations": collocs},
        }
        # script.py:186-202 page_wrapper + selection_wrapper
        self.crawl_state["pages"][page["title"]] = page
        self.crawl_state["page_stack"].append(page["title"])
        self.crawl_state["user_choice_stack"].append(page["title"])
        self.pointer["selection"] = page["title"]
        return page

    def _selected(self) -> dict | None:
        try:
            return self.crawl_state["pages"][self.pointer["selection"]]
        except KeyError:
            return None

    # ------------------------------------------------------- base cmds

    def handle_search(self, topic: str) -> None:
        """prompt.py:27-47: pointer substitution, corpus search, single
        result auto-analyzed, last_search updated."""
        if topic == "most_similar_colloc":
            topic = self.pointer["most_similar_colloc"]
        elif topic == "most_similar_freq":
            topic = self.pointer["most_similar_freq"]
        if topic is None:
            return
        results = [{"rank": r["rank"], "doc_id": r["doc_id"],
                    "title": r["title"], "via": r["via"]}
                   for r in corpus_search(self.spans, topic).collect()]
        if len(results) == 1:
            self._analyze_page(results[0]["doc_id"])
        self.crawl_state["last_search"] = results

    def handle_url(self, doc_ids: list[str]) -> None:
        """prompt.py:49-62 with the engine's doc_id grammar standing in
        for the wiki url regex (storage.DOC_ID_PATTERN)."""
        for d in doc_ids:
            if re.match(DOC_ID_PATTERN, d):
                self._analyze_page(d)
            else:
                self._emit("Invalid Wikipedia url.")

    # -------------------------------------------------------- st cmds

    def _most_similar(self, candidates: list[str], phrase: str) -> str | None:
        """prompt.py:81-89/106-114: first strict-max jaro-winkler over the
        rank-ordered candidate list (ties keep the earlier = higher-ranked
        candidate, matching the reference's '>' comparison)."""
        best = (0.0, None)
        for c in candidates:
            sim = jaro_winkler(c, phrase)
            if sim > best[0]:
                best = (sim, c)
        return best[1]

    def handle_state(self, sub: list[str]) -> bool:
        state = self._selected()
        if state is None:
            return False
        match sub:
            case ["colloc", *phrase]:
                collocs = [" ".join(c) for c in state["stats"]["collocations"]]
                if not phrase:
                    self._print_results(collocs)
                else:
                    self.pointer["most_similar_colloc"] = \
                        self._most_similar(collocs, " ".join(phrase))
            case ["freq", *phrase]:
                freqs = [f[0] for f in state["stats"]["frequencies"]]
                if not phrase:
                    self._print_results(freqs)
                else:
                    self.pointer["most_similar_freq"] = \
                        self._most_similar(freqs, " ".join(phrase))
            case ["sa", *idx]:
                try:
                    sel = list(state["see_also"].values())[int(idx[0])]
                    # see_also urls are absolute; strip to corpus doc_id
                    self._analyze_page(re.sub(r"^https?://[^/]+/", "", sel))
                except (ValueError, TypeError, IndexError):
                    self._print_results(list(state["see_also"].keys()))
            case ["links", pgidx, idx]:
                try:
                    sel = list(state["paragraph_links"][int(pgidx)]
                               .values())[int(idx)]
                    self._analyze_page(
                        re.sub(r"^(https?://[^/]+)?/", "", sel))
                except (ValueError, TypeError, IndexError):
                    self._emit("Invalid indices to paragraph link.")
            case ["links", idx]:
                try:
                    self._print_results(
                        list(state["paragraph_links"][int(idx)].keys()))
                except (ValueError, IndexError):
                    pass
            case ["links"]:
                for i, para in enumerate(state["paragraph_links"]):
                    self._emit(f"---\t{i}\t---")
                    if para:
                        self._print_results(list(para.keys()))
            case ["hist", *idx]:
                if not idx:
                    self._print_results(list(self.crawl_state["pages"]))
                else:
                    try:
                        title = self.crawl_state["page_stack"][int(idx[0])]
                        page = self.crawl_state["pages"][title]
                        self._analyze_page(page["doc_id"])
                    except (ValueError, IndexError, KeyError):
                        pass
            case ["found", *idx]:
                last = self.crawl_state["last_search"]
                if last is None:
                    return True
                if not idx:
                    self._print_results(last)
                else:
                    try:
                        page = (last[0] if len(last) == 1
                                else last[int(idx[0])])
                        self._analyze_page(page["doc_id"])
                    except (ValueError, IndexError):
                        pass
            case ["pop"]:
                # ADVICE r4: empty stacks emit an error line like the
                # other branches instead of aborting the whole script
                if not self.crawl_state["page_stack"]:
                    self._emit("st pop: page stack is empty")
                else:
                    self.pointer["selection"] = \
                        self.crawl_state["page_stack"].pop()
                    self.crawl_state["pop_stack"].append(
                        self.pointer["selection"])
            case ["unpop"]:
                if not self.crawl_state["pop_stack"]:
                    self._emit("st unpop: pop stack is empty")
                else:
                    self.crawl_state["page_stack"].append(
                        self.crawl_state["pop_stack"].pop())
            case ["current"]:
                self._emit(str(self.pointer["selection"]))
            case ["show", *amount]:
                try:
                    amt = float(amount[0]) if len(amount) == 1 else 0.1
                except (ValueError, IndexError):
                    amt = 0.1
                self._show_slices(state, amt)
            case ["sents", *start_stop]:
                self._handle_sents(state, start_stop)
            case ["save"]:
                self.save_state()
            case ["del"]:
                self.del_state()
            case ["help"]:
                self._emit("st colloc|freq|sa|links|hist|found|pop|unpop|"
                           "current|show|sents|save|del|help")
            case _:
                return False
        return True

    def _show_slices(self, state: dict, amount: float) -> None:
        """'st show' — the A11 summary slices of the selection
        (prompt.py:300-314 via analyze_page)."""
        doc_id = state["doc_id"]
        one = self.spans.filter(F.col("doc_id") == doc_id)
        body = one.select("doc_id", A.body_col(F.col("spans")).alias("body"))
        row = A.sentence_slices(body, amount=amount).collect()
        if row:
            for part in ("first5", "pivot", "last5"):
                for s in row[0][part]:
                    self._emit(s)

    def _handle_sents(self, state: dict, start_stop: list[str]) -> None:
        """'st sents [start|-] [stop|-]' with sticky endpoints
        (prompt.py:316-342)."""
        start = start_stop[0] if len(start_stop) >= 1 else None
        stop = start_stop[1] if len(start_stop) >= 2 else None
        if start is not None and start != "-":
            self._sents_start = start
        if stop is not None and stop != "-":
            self._sents_stop = stop
        start = self._sents_start if start in (None, "-") else start
        stop = self._sents_stop if stop in (None, "-") else stop
        one = self.spans.filter(F.col("doc_id") == state["doc_id"])
        row = one.select(
            A.sentences_col(
                F.array_join(A.paragraphs_col(F.col("spans")), "")
            ).alias("sents")).collect()
        if not row:
            return
        sents = list(row[0]["sents"])
        try:
            sel = sents[(int(start) if start is not None else None):
                        (int(stop) if stop is not None else None)]
        except ValueError:
            # ADVICE r4: non-integer endpoints emit an error line like the
            # sa/links/found handlers instead of raising out of run_script
            self._emit(f"st sents: bad range {start!r}:{stop!r}")
            return
        self.pointer["selected_text"] = sel
        for s in sel:
            self._emit(s)

    # ---------------------------------------------------- oracle cmds

    def handle_oracle(self, cmd: list[str]) -> None:
        """oracle.py:91-137 — the moves are scripts over base commands."""
        match cmd:
            case ["as", n, *start] | ["bas", n, *start]:
                hook = "seer build" if cmd[0] == "bas" else None
                self._autosearch(" ".join(start), int(n), hook)
            case ["cmov", n, *phrase]:
                self.run_script([f"st colloc {' '.join(phrase)}",
                                 "s most_similar_colloc",
                                 f"st found {n}"])
            case ["fmov", n, *phrase]:
                self.run_script([f"st freq {' '.join(phrase)}",
                                 "s most_similar_freq",
                                 f"st found {n}"])
            case _:
                pass

    def _highest_freq(self) -> str | None:
        """utils/frequency.py:3-15: strict-max over the stored pairs."""
        state = self._selected()
        if state is None:
            return None
        best, word = 0, None
        for w, n in state["stats"]["frequencies"]:
            if n > best:
                best, word = n, w
        return word

    def _autosearch(self, start: str, n: int, hook: str | None) -> None:
        """oracle.py:37-66: seed script + (n-1) delayed cmov hops; the
        lambda defers the highest-freq probe to execution time, exactly
        the reference's delayed-command mechanism (script.py:176-181)."""
        script: list = [f"s {start}", "st found 0"]
        if hook is not None:
            script.append(hook)
        for _ in range(n - 1):
            script.append(lambda: f"o cmov 0 {self._highest_freq()}")
            if hook is not None:
                script.append(hook)
        self.run_script(script)

    # ------------------------------------------------------ seer cmds

    def handle_seer(self, cmd: list[str], out_dir: str | None = None) -> None:
        """seer build [all] (arbiter/seer.py:15-33): markdown for the
        selection (or every page in history) via the engine's native
        markdown_doc, one file per page under state_dir/markdown
        (markdown.py:22-52's layout; the batch-scale path is
        sinks.markdown_export)."""
        if not cmd or cmd[0] != "build":
            return
        root = out_dir or os.path.join(self.state_dir or ".", "markdown")
        pages = (list(self.crawl_state["pages"].values())
                 if (len(cmd) > 1 and cmd[1] == "all")
                 else ([self._selected()] if self._selected() else []))
        for page in pages:
            one = self.spans.filter(F.col("doc_id") == page["doc_id"])
            rows = markdown_doc(one).collect()
            if not rows:
                continue
            safe = page["title"].translate(str.maketrans("", "", ":"))
            d = os.path.join(root, page["title"])
            os.makedirs(d, exist_ok=True)
            with open(os.path.join(d, f"{safe}.md"), "w",
                      encoding="utf-8") as f:
                f.write(rows[0]["markdown"])

    # ------------------------------------------------- script engine

    def parse_cmd(self, command: str) -> bool:
        """T11: prompt.py:359-418."""
        match command.split():
            case ["s", *phrase] if phrase:
                self.handle_search(" ".join(phrase))
            case ["u", *ids]:
                self.handle_url(ids)
            case ["st", *sub]:
                self.handle_state(sub)
            case ["o" | "oracle", *cmd]:
                self.handle_oracle(cmd)
            case ["seer", *cmd]:
                self.handle_seer(cmd)
            case ["pointer"]:
                self._emit(str(self.pointer))
            case ["state"]:
                self._emit(str(self.crawl_state))
            case ["help"]:
                self._emit("s u st o seer pointer state newf help exit")
            case ["exit"]:
                self._emit("Goodbye!")
            case ["newf", _name]:
                # newf consumes following lines until 'end'; only
                # run_script can supply them (no stdin here)
                raise ValueError(
                    "newf needs a line stream — define via run_script "
                    "or cmd_func_init(name, lines)")
            case _:
                self._emit(f"Unknown command: {command}")
                return False
        return True

    def cmd_func_init(self, name: str, lines: list[str]) -> None:
        """T12: script.py:116-136 (script-mode branch)."""
        self.functions[name] = list(lines)

    def run_function(self, name: str) -> None:
        """Engine extension: execute a stored function. The reference
        stores and persists functions but has no dispatch case that runs
        them (prompt.py:359-418) — this closes that loop explicitly."""
        self.run_script(list(self.functions[name]))

    def run_script(self, script_or_path) -> None:
        """T10: script.py:155-183 — string (multi-line or file path),
        open file, or list of commands/callables; 'newf NAME' inside a
        line stream collects the function body until 'end'."""
        if isinstance(script_or_path, str):
            lines = (script_or_path.split("\n") if "\n" in script_or_path
                     else open(script_or_path).read().splitlines())
        elif isinstance(script_or_path, list):
            lines = script_or_path
        else:  # file-like
            lines = [ln.rstrip("\n") for ln in script_or_path]
        pending: tuple[str, list[str]] | None = None
        for cmd in lines:
            if isinstance(cmd, Callable):
                cmd = cmd()
            cmd = cmd.strip()
            if pending is not None:
                if cmd == "end":
                    self.cmd_func_init(pending[0], pending[1])
                    pending = None
                else:
                    pending[1].append(cmd)
                continue
            parts = cmd.split()
            if len(parts) == 2 and parts[0] == "newf":
                pending = (parts[1], [])
                continue
            if cmd:
                self.parse_cmd(cmd)
        if pending is not None:
            self.cmd_func_init(pending[0], pending[1])

    # ----------------------------------------------------- state io

    def save_state(self) -> None:
        """script.py:92-114 (last_search cleared on save, as there)."""
        if self.state_dir is None:
            return
        st = dict(self.crawl_state)
        st["last_search"] = None
        write_state(os.path.join(self.state_dir, "crawl_state.json"), st)
        write_state(os.path.join(self.state_dir, "pointer.json"),
                    self.pointer)
        write_state(os.path.join(self.state_dir, "functions_cache.json"),
                    self.functions)

    def reset_state(self) -> None:
        self.crawl_state = {"user_choice_stack": [], "page_stack": [],
                            "pop_stack": [], "pages": {},
                            "last_search": None}
        self.pointer = dict(_EMPTY_POINTER)

    def del_state(self) -> None:
        self.reset_state()
        self.save_state()
