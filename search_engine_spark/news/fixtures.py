"""Deterministic RSS/Atom XML fixtures for the news-ingest pipeline.

No network in the sandbox, so feed XML is synthesized: even feed ids emit
RSS 2.0 (<channel><item>), odd ids emit Atom (<feed><entry>). Every edge
the reference parser handles is planted on a fixed schedule so tests and
pairs exercise them all:

- RFC-2822 pubDate with rotating utc offsets (E6)
- html entities + markup in descriptions (E21)
- relative item links resolved against the feed url
- author fallback chain (plain author vs dc:creator vs none)
- image via media:content / enclosure / none
- one item with no link (skipped), one with an oversized url (skipped)
- feed 0 overflows MAX_ITEMS_PER_FEED to exercise the 50-item cap

Everything derives from (feed_id, item index) integer arithmetic — no
randomness, no wall clock — so the expected parse is replayable anywhere.
"""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

EPOCH0 = datetime(2026, 1, 5, 12, 0, 0, tzinfo=timezone.utc)
OFFSETS = ["+0000", "+0530", "-0800", "+0200", "-0330"]
_WEEKDAYS = ["Mon", "Tue", "Wed", "Thu", "Fri", "Sat", "Sun"]
_MONTHS = [
    "Jan", "Feb", "Mar", "Apr", "May", "Jun",
    "Jul", "Aug", "Sep", "Oct", "Nov", "Dec",
]


def rfc2822(dt: datetime, offset: str) -> str:
    """Format an aware-UTC instant as RFC-2822 in the given numeric offset
    (so parsing must undo the offset to recover the instant)."""
    sign = 1 if offset[0] == "+" else -1
    delta = timedelta(hours=int(offset[1:3]), minutes=int(offset[3:5]))
    local = dt + sign * delta
    return (
        f"{_WEEKDAYS[local.weekday()]}, {local.day:02d} "
        f"{_MONTHS[local.month - 1]} {local.year} "
        f"{local.hour:02d}:{local.minute:02d}:{local.second:02d} {offset}"
    )


def item_published(feed_id: int, i: int) -> datetime:
    """Deterministic publish instant: feeds interleave, items step 97 min."""
    return EPOCH0 + timedelta(minutes=feed_id * 13 + i * 97)


def feed_url_of(feed_id: int) -> str:
    return f"https://feeds.example/{feed_id}/rss.xml"


def _rss_item(feed_id: int, i: int) -> str:
    pub = rfc2822(item_published(feed_id, i), OFFSETS[(feed_id + i) % len(OFFSETS)])
    desc = (
        f"Lead &amp; summary <b>no. {i}</b> &#8212; stats &lt;draft&gt;"
        if i % 3 == 0
        else f"Plain summary {i}"
    )
    author = (
        f"<author>reporter{i}@example.com</author>"
        if i % 2 == 0
        else f"<dc:creator>Desk {i}</dc:creator>"
    )
    image = (
        f'<media:content url="/img/{i}.jpg" />'
        if i % 4 == 0
        else (f'<enclosure url="https://cdn.example/e{i}.png" type="image/png" />' if i % 4 == 1 else "")
    )
    # relative link on every other item: resolution against the feed url
    link = f"/story/{feed_id}/{i}" if i % 2 == 0 else f"https://news{feed_id}.example/a/{i}"
    return f"""    <item>
      <title>Feed {feed_id} story {i}</title>
      <link>{link}</link>
      <description>{desc}</description>
      {author}
      {image}
      <pubDate>{pub}</pubDate>
    </item>"""


def _atom_entry(feed_id: int, i: int) -> str:
    pub = rfc2822(item_published(feed_id, i), OFFSETS[(feed_id + i) % len(OFFSETS)])
    return f"""    <entry>
      <title>Feed {feed_id} entry {i}</title>
      <link href="https://news{feed_id}.example/a/{i}" />
      <summary>Atom summary &amp; text {i}</summary>
      <author><name>Writer {i}</name></author>
      <content>Entry body {i} with shared vocabulary data query spark.</content>
      <updated>{pub}</updated>
    </entry>"""


def synth_feed_xml(feed_id: int, n_items: int = 6) -> str:
    """One deterministic feed document (RSS for even ids, Atom for odd)."""
    feed_url = feed_url_of(feed_id)
    if feed_id % 2 == 0:
        items = [_rss_item(feed_id, i) for i in range(n_items)]
        # planted skips: an item without a link, an item with a >2000-char url
        items.append("    <item><title>linkless</title></item>")
        items.append(
            f'    <item><title>oversized</title><link>https://news{feed_id}.example/'
            + "x" * 2100
            + "</link></item>"
        )
        declared = rfc2822(EPOCH0 - timedelta(days=1), "+0000")
        return f"""<?xml version="1.0"?>
<rss version="2.0" xmlns:media="http://search.yahoo.com/mrss/" xmlns:dc="http://purl.org/dc/elements/1.1/">
  <channel>
    <title>Example feed {feed_id}</title>
    <link>https://news{feed_id}.example/</link>
    <lastBuildDate>{declared}</lastBuildDate>
{chr(10).join(items)}
  </channel>
</rss>"""
    entries = [_atom_entry(feed_id, i) for i in range(n_items)]
    return f"""<?xml version="1.0"?>
<feed xmlns="http://www.w3.org/2005/Atom">
  <title>Atom feed {feed_id}</title>
  <link href="https://news{feed_id}.example/" />
  <updated>{rfc2822(EPOCH0 - timedelta(days=2), "+0000")}</updated>
{chr(10).join(entries)}
</feed>"""


def synth_feeds(n_feeds: int = 6, n_items: int = 6) -> list[tuple[str, str]]:
    """(feed_url, xml) rows; feed 0 overflows the 50-item cap."""
    rows = []
    for fid in range(n_feeds):
        count = 55 if fid == 0 else n_items
        rows.append((feed_url_of(fid), synth_feed_xml(fid, count)))
    return rows
