"""Menu parity (reference src/ui/menus.ts + utils.ts): error totals,
post-crawl choice labels and gating, main-menu loop semantics."""

from ethos_spark.ui.menus import (
    calculate_total_errors,
    post_crawl_choices,
    required_field_issues,
    show_main_menu,
    show_post_crawl_menu,
)


def _fs(name, opt, ok, att):
    return {
        "field_name": name,
        "is_optional": opt,
        "success_count": ok,
        "total_attempts": att,
    }


def test_required_field_issues_filters_like_reference():
    stats = [
        _fs("title", False, 9, 10),   # required, lossy -> issue
        _fs("author", True, 0, 10),   # optional -> never an issue
        _fs("url", False, 10, 10),    # required, clean -> no issue
    ]
    assert [s["field_name"] for s in required_field_issues(stats)] == ["title"]


def test_calculate_total_errors_sums_three_sources():
    stats = [_fs("title", False, 9, 10), _fs("date", False, 2, 10)]
    assert calculate_total_errors(["l1", "l2"], ["c1"], stats) == 5
    assert calculate_total_errors([], [], []) == 0


def test_post_crawl_choices_labels_and_error_gating():
    # junction count wins over itemsFound (menus.ts:31-45)
    c = post_crawl_choices(items_found=80, total_errors=0, stored_count=42)
    assert c[0] == ("View extracted data (42)", "view")
    assert all(v != "errors" for _, v in c)  # no errors -> no error entry
    c2 = post_crawl_choices(items_found=80, total_errors=3)
    assert c2[0] == ("View extracted data (80)", "view")
    assert ("View crawling errors (3)", "errors") in c2


class Script:
    def __init__(self, cmds):
        self.cmds = list(cmds)
        self.out = []

    def input(self, _p=""):
        if not self.cmds:
            raise EOFError
        return self.cmds.pop(0)

    def print(self, *a):
        self.out.append(" ".join(str(x) for x in a))
        return None


def test_post_crawl_menu_numeric_and_value_input():
    s = Script(["2"])
    got = show_post_crawl_menu(10, 1, None, s.input, s.print)
    assert got == "errors"
    s2 = Script(["exit"])
    assert show_post_crawl_menu(10, 0, None, s2.input, s2.print) == "exit"


def test_main_menu_dispatch_and_goodbye():
    calls = []

    def mk(name, ret=None):
        def h():
            calls.append(name)
            return ret

        return h

    s = Script(["sessions", "bogus", "exit"])
    show_main_menu(
        {"crawl": mk("crawl"), "sessions": mk("sessions"), "clean": mk("clean")},
        s.input,
        s.print,
    )
    assert calls == ["sessions"]
    assert "Unknown command" in s.out
    assert s.out[-1] == "Goodbye!"


def test_main_menu_crawl_again_loop_then_exit_action():
    seq = iter(["crawl", None])  # first crawl returns 'crawl' again, then stop

    calls = []

    def crawl():
        calls.append("crawl")
        return next(seq)

    def sessions():
        calls.append("sessions")
        return "exit"  # handler-driven exit (menus.ts:126-129)

    s = Script(["crawl", "sessions"])
    show_main_menu({"crawl": crawl, "sessions": sessions}, s.input, s.print)
    assert calls == ["crawl", "crawl", "sessions"]
    assert s.out[-1] == "Goodbye!"
