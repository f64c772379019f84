/* HTML main-content extraction kernel: a C twin of
 * pipeline/extract.py's fast scanner (_fast_feed) + event sink (_Sink).
 *
 * Tokenizes a batch of UTF-8 documents and runs the container-scoring
 * sink entirely in C, emitting per-document arrays of text-chunk spans
 * (byte offsets into the input buffer) plus the winning container's
 * chunk range. Python assembles only the winner's text (slicing spans
 * and running html.unescape on the few chunks containing '&').
 *
 * Equivalence contract: for every document it COMPLETES, the event
 * stream and scores match pipeline/extract.py's fast engine exactly
 * (which is itself differential-fuzz-pinned against html.parser). The
 * kernel never guesses on the Unicode-sensitive constructs Python
 * regexes resolve with str semantics — any of the following sets the
 * document's fallback flag and the caller reruns that document through
 * the Python engine instead:
 *   - a non-ASCII byte inside a start/end tag name or a '/>'-ending
 *     start tag (Python str.lower()/\s could change classification,
 *     e.g. KELVIN SIGN lowercasing into 'k')
 *   - a non-ASCII byte where a \s* run decides a construct close
 *     (comment '--\s*>', marked-section ']\s*]\s*>', end-tag \s)
 *
 * Whitespace sets mirror CPython exactly (probed):
 *   unicode \s (ASCII part) = {09 0a 0b 0c 0d 1c 1d 1e 1f 20}
 *   ascii   \s              = {09 0a 0b 0c 0d 20}
 * Entity-length emulation mirrors html.unescape (see
 * html_entities_gen.c for the generated stdlib tables); the kernel
 * only needs the unescaped CODEPOINT COUNT per chunk, because
 * container scores are computed on post-unescape lengths.
 */

#include <stdint.h>
#include <string.h>

typedef struct { const char *name; uint8_t nlen; uint8_t repl_cp; } ohs_ent_t;
extern const ohs_ent_t OHS_HTML5_ENTS[];
extern const long OHS_HTML5_N;
extern const int32_t OHS_INVALID_CREF[];
extern const long OHS_INVALID_CREF_N;
extern const int32_t OHS_INVALID_CP[];
extern const long OHS_INVALID_CP_N;

/* ------------------------------------------------------------------ tags */

enum {
    T_OTHER = 0, T_A,
    /* skip */
    T_SCRIPT, T_STYLE, T_NOSCRIPT, T_TEMPLATE, T_HEAD, T_TITLE,
    /* candidates (contiguous) */
    T_BODY, T_MAIN, T_ARTICLE, T_SECTION, T_DIV, T_TD,
    /* other block (contiguous through T_HR) */
    T_P, T_LI, T_UL, T_OL, T_TABLE, T_TR, T_BLOCKQUOTE, T_PRE,
    T_H1, T_H2, T_H3, T_H4, T_H5, T_H6, T_HEADER, T_FOOTER, T_NAV,
    T_ASIDE, T_FORM, T_FIGURE, T_BR, T_HR,
    /* void (non-br/hr) */
    T_IMG, T_INPUT, T_META, T_LINK, T_AREA, T_BASE, T_COL, T_EMBED,
    T_SOURCE, T_TRACK, T_WBR
};

static const struct { const char *n; int id; } TAGS[] = {
    {"a", T_A}, {"script", T_SCRIPT}, {"style", T_STYLE},
    {"noscript", T_NOSCRIPT}, {"template", T_TEMPLATE}, {"head", T_HEAD},
    {"title", T_TITLE}, {"body", T_BODY}, {"main", T_MAIN},
    {"article", T_ARTICLE}, {"section", T_SECTION}, {"div", T_DIV},
    {"td", T_TD}, {"p", T_P}, {"li", T_LI}, {"ul", T_UL}, {"ol", T_OL},
    {"table", T_TABLE}, {"tr", T_TR}, {"blockquote", T_BLOCKQUOTE},
    {"pre", T_PRE}, {"h1", T_H1}, {"h2", T_H2}, {"h3", T_H3},
    {"h4", T_H4}, {"h5", T_H5}, {"h6", T_H6}, {"header", T_HEADER},
    {"footer", T_FOOTER}, {"nav", T_NAV}, {"aside", T_ASIDE},
    {"form", T_FORM}, {"figure", T_FIGURE}, {"br", T_BR}, {"hr", T_HR},
    {"img", T_IMG}, {"input", T_INPUT}, {"meta", T_META},
    {"link", T_LINK}, {"area", T_AREA}, {"base", T_BASE}, {"col", T_COL},
    {"embed", T_EMBED}, {"source", T_SOURCE}, {"track", T_TRACK},
    {"wbr", T_WBR},
};

static int tag_id(const uint8_t *p, long len)
{
    if (len < 1 || len > 10)
        return T_OTHER;
    char low[11];
    for (long i = 0; i < len; i++) {
        uint8_t c = p[i];
        low[i] = (char)(c >= 'A' && c <= 'Z' ? c + 32 : c);
    }
    low[len] = 0;
    for (unsigned k = 0; k < sizeof(TAGS) / sizeof(TAGS[0]); k++)
        if (TAGS[k].n[len] == 0 && memcmp(TAGS[k].n, low, len) == 0)
            return TAGS[k].id;
    return T_OTHER;
}

static int is_skipt(int t) { return t >= T_SCRIPT && t <= T_TITLE; }
static int is_cand(int t) { return t >= T_BODY && t <= T_TD; }
static int is_block(int t) { return t >= T_BODY && t <= T_HR; }

/* ------------------------------------------------------------------ char sets */

/* unicode \s, ASCII part (also == str.isspace ASCII part) */
static int uws(uint8_t c)
{
    return (c >= 0x09 && c <= 0x0d) || (c >= 0x1c && c <= 0x1f) || c == 0x20;
}

/* ascii \s (re.A) */
static int aws(uint8_t c)
{
    return (c >= 0x09 && c <= 0x0d) || c == 0x20;
}

static int is_alpha(uint8_t c)
{
    return (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z');
}

/* _START_NAME / _END_LOOSE / _TAGNAME_SKIP tail class:
 * [^\t\n\r\f />\x00] — note \v and \x1c-\x1f are ALLOWED */
static int name_char(uint8_t c)
{
    return !(c == 0x09 || c == 0x0a || c == 0x0d || c == 0x0c ||
             c == ' ' || c == '/' || c == '>' || c == 0x00);
}

/* ------------------------------------------------------------- entity length */

static int inv_cref(long num)
{
    for (long i = 0; i < OHS_INVALID_CREF_N; i++)
        if (OHS_INVALID_CREF[i] == num)
            return 1;
    return 0;
}

static int inv_cp(long num)
{
    long lo = 0, hi = OHS_INVALID_CP_N - 1;
    while (lo <= hi) {
        long mid = (lo + hi) / 2;
        if (OHS_INVALID_CP[mid] == num)
            return 1;
        if (OHS_INVALID_CP[mid] < num)
            lo = mid + 1;
        else
            hi = mid - 1;
    }
    return 0;
}

/* bsearch the generated (sorted) entity table; -1 when absent */
static long ent_lookup(const uint8_t *p, long len)
{
    long lo = 0, hi = OHS_HTML5_N - 1;
    while (lo <= hi) {
        long mid = (lo + hi) / 2;
        const ohs_ent_t *e = &OHS_HTML5_ENTS[mid];
        long cl = e->nlen < len ? e->nlen : len;
        int c = memcmp(e->name, p, (size_t)cl);
        if (c == 0)
            c = (e->nlen > len) - (e->nlen < len);
        if (c == 0)
            return mid;
        if (c < 0)
            lo = mid + 1;
        else
            hi = mid - 1;
    }
    return -1;
}

/* entity class [^\t\n\f <&#;] — \r and '>' are NOT excluded */
static int ent_char(uint8_t c)
{
    return !(c == 0x09 || c == 0x0a || c == 0x0c || c == ' ' ||
             c == '<' || c == '&' || c == '#' || c == ';');
}

/* codepoint count of html.unescape(s[a:b]); sets *amp if '&' present */
static int64_t unesc_cp_count(const uint8_t *s, long a, long b, int *amp)
{
    int64_t cp = 0;
    long i = a;
    *amp = 0;
    while (i < b) {
        uint8_t c = s[i];
        if (c != '&') {
            cp += ((c & 0xC0) != 0x80);
            i++;
            continue;
        }
        *amp = 1;
        long j = i + 1;
        if (j < b && s[j] == '#') {
            long k = j + 1;
            long num = 0;
            int got = 0;
            if (k < b && (s[k] == 'x' || s[k] == 'X')) {
                long h = k + 1;
                while (h < b) {
                    uint8_t d = s[h];
                    int v = (d >= '0' && d <= '9') ? d - '0'
                          : (d >= 'a' && d <= 'f') ? d - 'a' + 10
                          : (d >= 'A' && d <= 'F') ? d - 'A' + 10 : -1;
                    if (v < 0)
                        break;
                    if (num < 0x1100000)
                        num = num * 16 + v;
                    h++;
                    got = 1;
                }
                if (got)
                    k = h;
            }
            if (!got) {
                long h = j + 1;
                num = 0;
                while (h < b && s[h] >= '0' && s[h] <= '9') {
                    if (num < 0x1100000)
                        num = num * 10 + (s[h] - '0');
                    h++;
                    got = 1;
                }
                if (got)
                    k = h;
            }
            if (!got) {
                /* '&#' with no digits: no regex match — '&' is literal
                 * and scanning resumes after it ('#' is an ordinary
                 * char, excluded from the named class anyway) */
                cp += 1;
                i = j;
                continue;
            }
            if (k < b && s[k] == ';')
                k++;
            if (inv_cref(num))
                cp += 1;
            else if ((num >= 0xD800 && num <= 0xDFFF) || num > 0x10FFFF)
                cp += 1;
            else if (inv_cp(num))
                cp += 0;
            else
                cp += 1;
            i = k;
            continue;
        }
        /* named: up to 32 CODEPOINTS of the entity class */
        long cpo[34];          /* byte offset of each cp boundary */
        long ncps = 0;
        long k = j;
        while (k < b && ncps < 32 && ent_char(s[k]) &&
               !(s[k] >= 0x80 && (s[k] & 0xC0) == 0x80)) {
            /* advance one UTF-8 codepoint */
            cpo[ncps] = k;
            long step = 1;
            if (s[k] >= 0xF0)
                step = 4;
            else if (s[k] >= 0xE0)
                step = 3;
            else if (s[k] >= 0xC0)
                step = 2;
            if (k + step > b)
                step = b - k;
            k += step;
            ncps++;
        }
        cpo[ncps] = k;
        if (ncps == 0) {
            cp += 1;
            i = j;
            continue;
        }
        int semi = (k < b && s[k] == ';');
        long glen = ncps + semi;       /* len(group) in codepoints */
        long gend = k + semi;          /* byte end of the group */
        /* exact match: full group (incl ';' when present) */
        long hit = ent_lookup(s + j, gend - j);
        if (hit >= 0) {
            cp += OHS_HTML5_ENTS[hit].repl_cp;
            i = gend;
            continue;
        }
        /* longest-prefix match: x = glen-1 .. 2 codepoints; prefixes
         * never include the trailing ';' (it is the last cp) */
        int done = 0;
        for (long x = glen - 1; x >= 2; x--) {
            if (x > ncps)
                continue;
            long pend = cpo[x];
            long h2 = ent_lookup(s + j, pend - j);
            if (h2 >= 0) {
                cp += OHS_HTML5_ENTS[h2].repl_cp + (glen - x);
                i = gend;
                done = 1;
                break;
            }
        }
        if (!done) {
            cp += 1 + glen;    /* literal '&' + group */
            i = gend;
        }
    }
    return cp;
}

/* --------------------------------------------------- start-tag sub-parsers */

/* _scan_starttag_end: index past '>', or -1 (explicit ASCII sets) */
static long scan_starttag_end(const uint8_t *s, long j, long n)
{
    while (j < n) {
        uint8_t ch = s[j];
        if (ch == '>')
            return j + 1;
        if (ch == '=') {
            long k = j + 1;
            while (k < n && (s[k] == ' ' || s[k] == '\t' || s[k] == '\n' ||
                             s[k] == '\r' || s[k] == 0x0c || s[k] == '='))
                k++;
            if (k < n && (s[k] == '\'' || s[k] == '"')) {
                uint8_t q = s[k];
                long p = k + 1;
                while (p < n && s[p] != q)
                    p++;
                if (p >= n)
                    return -1;
                j = p + 1;
            } else {
                j = k;
            }
            continue;
        }
        j++;
    }
    return -1;
}

/* _is_startend on a PURE-ASCII tag string s[0..len) == '<...>'.
 * Returns 1 = self-closing, 0 = not, -1 = needs Python fallback: an
 * UNTERMINATED quoted attribute value makes Python's _ATTR_SKIP regex
 * backtrack into an empty unquoted value and re-walk from there —
 * full backtracking semantics this linear scan does not replicate
 * (differential-fuzz finding: control bytes \x0b/\x1c-\x1f inside
 * '/>'-ending tags reached that path). */
static int is_startend(const uint8_t *t, long len)
{
    /* _TAGNAME_SKIP: [a-zA-Z][^\t\n\r\f />\x00]* (?:\s|/(?!>))* */
    long k = 1;
    if (k >= len || !is_alpha(t[k]))
        return 0;
    k++;
    while (k < len && name_char(t[k]))
        k++;
    for (;;) {
        if (k < len && uws(t[k])) {
            k++;
            continue;
        }
        if (k < len && t[k] == '/' && !(k + 1 < len && t[k + 1] == '>')) {
            k++;
            continue;
        }
        break;
    }
    /* _ATTR_SKIP walk */
    while (k < len - 1) {
        long start = k;
        /* lookbehind (?<=['"\s/]) */
        uint8_t prev = t[k - 1];
        if (!(prev == '\'' || prev == '"' || prev == '/' || uws(prev)))
            break;
        /* attr name: [^\s/>][^\s/=>]* */
        if (k >= len || uws(t[k]) || t[k] == '/' || t[k] == '>')
            break;
        k++;
        while (k < len && !uws(t[k]) && t[k] != '/' && t[k] != '=' &&
               t[k] != '>')
            k++;
        /* optional (\s*=+\s*(value))? */
        long save = k;
        long v = k;
        while (v < len && uws(t[v]))
            v++;
        if (v < len && t[v] == '=') {
            while (v < len && t[v] == '=')
                v++;
            while (v < len && uws(t[v]))
                v++;
            if (v < len && (t[v] == '\'' || t[v] == '"')) {
                uint8_t q = t[v];
                long p = v + 1;
                while (p < len && t[p] != q)
                    p++;
                if (p < len) {
                    k = p + 1;
                } else {
                    return -1;  /* unterminated quoted value: Python
                                 * backtracks into an empty unquoted
                                 * value; punt to the Python engine */
                }
            } else {
                /* unquoted [^>\s]* (may be empty) */
                while (v < len && !uws(t[v]) && t[v] != '>')
                    v++;
                k = v;
            }
        } else {
            k = save;
        }
        /* trailing (?:\s|/(?!>))* */
        for (;;) {
            if (k < len && uws(t[k])) {
                k++;
                continue;
            }
            if (k < len && t[k] == '/' && !(k + 1 < len && t[k + 1] == '>')) {
                k++;
                continue;
            }
            break;
        }
        if (k == start)
            break;
    }
    /* tag[k:].strip() == "/>" : strip uws both ends */
    long a = k, b2 = len;
    while (a < b2 && uws(t[a]))
        a++;
    while (b2 > a && uws(t[b2 - 1]))
        b2--;
    return (b2 - a == 2 && t[a] == '/' && t[a + 1] == '>');
}

/* --------------------------------------------------------------- main parse */

typedef struct {
    /* outputs */
    int64_t *chunk_a, *chunk_b, *chunk_cp;
    uint8_t *chunk_flags;           /* bit0 newline, bit1 amp, bit2 link */
    int64_t *cont_c0, *cont_c1;
    long n_chunks, n_conts;
    long max_chunks, max_conts;
    /* sink state */
    int skip, link;
    int stack_tag[4096];
    long stack_cont[4096];
    int depth;
    int overflow;
    int bail;           /* container stack deeper than the C cap:
                           fall back to Python for this document */
} sink_t;

static void add_newline(sink_t *k)
{
    if (k->n_chunks >= k->max_chunks) {
        k->overflow = 1;
        return;
    }
    k->chunk_a[k->n_chunks] = 0;
    k->chunk_b[k->n_chunks] = 0;
    k->chunk_cp[k->n_chunks] = 0;
    k->chunk_flags[k->n_chunks] = 1;
    k->n_chunks++;
}

static void add_text(sink_t *k, const uint8_t *s, long a, long b)
{
    if (k->skip || b <= a)
        return;
    int amp = 0;
    int64_t cp = unesc_cp_count(s, a, b, &amp);
    if (cp == 0)
        return;                    /* unescapes to '' — never emitted */
    if (k->n_chunks >= k->max_chunks) {
        k->overflow = 1;
        return;
    }
    k->chunk_a[k->n_chunks] = a;
    k->chunk_b[k->n_chunks] = b;
    k->chunk_cp[k->n_chunks] = cp;
    k->chunk_flags[k->n_chunks] =
        (uint8_t)((amp ? 2 : 0) | (k->link > 0 ? 4 : 0));
    k->n_chunks++;
}

static void start_tag(sink_t *k, int t)
{
    if (t == T_BR || t == T_HR) {
        if (!k->skip)
            add_newline(k);
        return;
    }
    if (t >= T_IMG && t <= T_WBR)
        return;                    /* other void */
    if (is_skipt(t)) {
        k->skip++;
        return;
    }
    if (t == T_A)
        k->link++;
    if (is_cand(t)) {
        if (k->depth >= 4096) {
            k->bail = 1;
        } else if (k->n_conts >= k->max_conts) {
            k->overflow = 1;
        } else {
            k->cont_c0[k->n_conts] = k->n_chunks;
            k->cont_c1[k->n_conts] = -1;
            k->stack_tag[k->depth] = t;
            k->stack_cont[k->depth] = k->n_conts;
            k->depth++;
            k->n_conts++;
        }
    }
    if (is_block(t) && !k->skip)
        add_newline(k);
}

static void end_tag(sink_t *k, int t)
{
    if (is_skipt(t)) {
        if (k->skip > 0)
            k->skip--;
        return;
    }
    if (t == T_A && k->link > 0)
        k->link--;
    if (is_cand(t)) {
        for (int i = k->depth - 1; i >= 0; i--) {
            if (k->stack_tag[i] == t) {
                for (int j2 = i; j2 < k->depth; j2++)
                    k->cont_c1[k->stack_cont[j2]] = k->n_chunks;
                k->depth = i;
                break;
            }
        }
    }
    if (is_block(t) && !k->skip)
        add_newline(k);
}

/* goahead's incomplete-construct fallback; returns new pos */
static long fallback_data(sink_t *k, const uint8_t *s, long lt, long n)
{
    const uint8_t *gt = memchr(s + lt + 1, '>', (size_t)(n - lt - 1));
    long end;
    if (gt == 0) {
        const uint8_t *lt2 = memchr(s + lt + 1, '<', (size_t)(n - lt - 1));
        end = lt2 ? (long)(lt2 - s) : lt + 1;
    } else {
        end = (long)(gt - s) + 1;
    }
    add_text(k, s, lt, end);
    return end;
}

/* returns 0 ok, 1 = needs Python fallback for this document */
static int parse_doc(const uint8_t *s, long n, sink_t *k)
{
    long pos = 0;
    while (pos < n) {
        if (k->bail)
            return 1;
        const uint8_t *ltp = memchr(s + pos, '<', (size_t)(n - pos));
        if (ltp == 0) {
            add_text(k, s, pos, n);
            break;
        }
        long lt = (long)(ltp - s);
        add_text(k, s, pos, lt);
        uint8_t c = lt + 1 < n ? s[lt + 1] : 0;
        if (is_alpha(c)) {
            long end = scan_starttag_end(s, lt + 1, n);
            if (end < 0) {
                pos = fallback_data(k, s, lt, n);
                continue;
            }
            /* name: [a-zA-Z] name_char* ; bail on non-ASCII in name */
            long ne = lt + 2;
            while (ne < end && name_char(s[ne]))
                ne++;
            for (long q = lt + 1; q < ne; q++)
                if (s[q] >= 0x80)
                    return 1;
            int t = tag_id(s + lt + 1, ne - lt - 1);
            pos = end;
            /* '/>'-ending tag: classification needs the full attr walk;
             * any non-ASCII inside makes Python's \s/str semantics
             * reachable — bail */
            if (end - lt >= 2 && s[end - 2] == '/' && s[end - 1] == '>') {
                for (long q = lt; q < end; q++)
                    if (s[q] >= 0x80)
                        return 1;
                {
                    int se = is_startend(s + lt, end - lt);
                    if (se < 0)
                        return 1;
                    start_tag(k, t);
                    if (se) {
                        end_tag(k, t);
                        continue;
                    }
                }
            } else {
                start_tag(k, t);
            }
            if (t == T_SCRIPT || t == T_STYLE) {
                /* rawtext: find '</' aws* name-ci aws* '>' (re.I|re.A) */
                const char *nm = (t == T_SCRIPT) ? "script" : "style";
                long nl = (t == T_SCRIPT) ? 6 : 5;
                long i2 = pos;
                long close = -1;
                while (i2 + 1 < n) {
                    const uint8_t *sl =
                        memchr(s + i2, '<', (size_t)(n - i2));
                    if (sl == 0)
                        break;
                    long p2 = (long)(sl - s);
                    if (p2 + 1 >= n)
                        break;
                    if (s[p2 + 1] != '/') {
                        i2 = p2 + 1;
                        continue;
                    }
                    long q2 = p2 + 2;
                    while (q2 < n && aws(s[q2]))
                        q2++;
                    long m2 = 0;
                    while (m2 < nl && q2 + m2 < n) {
                        uint8_t cc = s[q2 + m2];
                        if (cc >= 'A' && cc <= 'Z')
                            cc += 32;
                        if (cc != (uint8_t)nm[m2])
                            break;
                        m2++;
                    }
                    if (m2 == nl) {
                        long r2 = q2 + nl;
                        while (r2 < n && aws(s[r2]))
                            r2++;
                        if (r2 < n && s[r2] == '>') {
                            close = p2;
                            break;
                        }
                    }
                    i2 = p2 + 1;
                }
                pos = close >= 0 ? close : n;
            }
            continue;
        }
        if (c == '/') {
            const uint8_t *gtp =
                memchr(s + lt + 1, '>', (size_t)(n - lt - 1));
            if (gtp == 0) {
                pos = fallback_data(k, s, lt, n);
                continue;
            }
            long gt = (long)(gtp - s);
            /* any non-ASCII inside the end tag: Python's unicode-\s
             * strict pattern could still match — bail */
            for (long q = lt; q <= gt; q++)
                if (s[q] >= 0x80)
                    return 1;
            pos = gt + 1;
            /* _END_STRICT: </ \s* [a-zA-Z][-.a-zA-Z0-9:_]* \s* > (whole) */
            long q = lt + 2;
            while (q < gt && uws(s[q]))
                q++;
            long nm0 = q;
            if (q < gt && is_alpha(s[q])) {
                q++;
                while (q < gt &&
                       (is_alpha(s[q]) || (s[q] >= '0' && s[q] <= '9') ||
                        s[q] == '-' || s[q] == '.' || s[q] == ':' ||
                        s[q] == '_'))
                    q++;
                long nm1 = q;
                while (q < gt && uws(s[q]))
                    q++;
                if (q == gt) {
                    end_tag(k, tag_id(s + nm0, nm1 - nm0));
                    continue;
                }
            }
            /* _END_LOOSE: </[a-zA-Z]name_char*  (prefix match) */
            if (lt + 2 < gt + 1 && is_alpha(s[lt + 2])) {
                long e2 = lt + 3;
                while (e2 <= gt && name_char(s[e2]) && e2 < gt)
                    e2++;
                end_tag(k, tag_id(s + lt + 2, e2 - lt - 2));
            }
            /* else bogus comment: no event */
            continue;
        }
        if (c == '!') {
            if (lt + 3 < n && s[lt + 2] == '-' && s[lt + 3] == '-') {
                /* comment: search '--' uws* '>' from lt+4 */
                long i2 = lt + 4;
                long close = -1;
                while (i2 + 1 < n) {
                    if (s[i2] == '-' && s[i2 + 1] == '-') {
                        long q2 = i2 + 2;
                        while (q2 < n && uws(s[q2]))
                            q2++;
                        if (q2 < n && s[q2] >= 0x80)
                            return 1;   /* possible unicode \s */
                        if (q2 < n && s[q2] == '>') {
                            close = q2 + 1;
                            break;
                        }
                    }
                    i2++;
                }
                pos = close >= 0 ? close : fallback_data(k, s, lt, n);
                continue;
            }
            if (lt + 2 < n && s[lt + 2] == '[') {
                /* marked section: _MS_NAME at lt+3 */
                long q2 = lt + 3;
                long name0 = q2;
                if (q2 < n && is_alpha(s[q2])) {
                    q2++;
                    while (q2 < n &&
                           (is_alpha(s[q2]) ||
                            (s[q2] >= '0' && s[q2] <= '9') ||
                            s[q2] == '-' || s[q2] == '_' || s[q2] == '.'))
                        q2++;
                }
                long nlen = q2 - name0;
                char low[12];
                int known = 0;      /* 1=cdata family, 2=cond */
                if (nlen >= 1 && nlen <= 7) {
                    for (long z = 0; z < nlen; z++) {
                        uint8_t cc = s[name0 + z];
                        low[z] = (char)(cc >= 'A' && cc <= 'Z' ? cc + 32
                                                               : cc);
                    }
                    low[nlen] = 0;
                    if (!strcmp(low, "temp") || !strcmp(low, "cdata") ||
                        !strcmp(low, "ignore") || !strcmp(low, "include") ||
                        !strcmp(low, "rcdata"))
                        known = 1;
                    else if (!strcmp(low, "if") || !strcmp(low, "else") ||
                             !strcmp(low, "endif"))
                        known = 2;
                }
                if (!known) {
                    const uint8_t *g2 =
                        memchr(s + lt + 1, '>', (size_t)(n - lt - 1));
                    pos = g2 ? (long)(g2 - s) + 1
                             : fallback_data(k, s, lt, n);
                    continue;
                }
                /* closer: ']' uws* (']' uws*)? '>' from lt+3 */
                long i2 = lt + 3;
                long close = -1;
                while (i2 < n) {
                    const uint8_t *br =
                        memchr(s + i2, ']', (size_t)(n - i2));
                    if (br == 0)
                        break;
                    long p2 = (long)(br - s);
                    long r2 = p2 + 1;
                    while (r2 < n && uws(s[r2]))
                        r2++;
                    if (r2 < n && s[r2] >= 0x80)
                        return 1;
                    if (known == 1) {       /* ]\s*]\s*> */
                        if (r2 < n && s[r2] == ']') {
                            long r3 = r2 + 1;
                            while (r3 < n && uws(s[r3]))
                                r3++;
                            if (r3 < n && s[r3] >= 0x80)
                                return 1;
                            if (r3 < n && s[r3] == '>') {
                                close = r3 + 1;
                                break;
                            }
                        }
                    } else {                 /* ]\s*> */
                        if (r2 < n && s[r2] == '>') {
                            close = r2 + 1;
                            break;
                        }
                    }
                    i2 = p2 + 1;
                }
                pos = close >= 0 ? close : fallback_data(k, s, lt, n);
                continue;
            }
            /* declaration / bogus comment: first raw '>' */
            {
                const uint8_t *g2 =
                    memchr(s + lt + 1, '>', (size_t)(n - lt - 1));
                pos = g2 ? (long)(g2 - s) + 1 : fallback_data(k, s, lt, n);
            }
            continue;
        }
        if (c == '?') {
            const uint8_t *g2 =
                memchr(s + lt + 1, '>', (size_t)(n - lt - 1));
            pos = g2 ? (long)(g2 - s) + 1 : fallback_data(k, s, lt, n);
            continue;
        }
        /* literal '<' */
        if (!k->skip) {
            if (k->n_chunks >= k->max_chunks) {
                k->overflow = 1;
            } else {
                k->chunk_a[k->n_chunks] = lt;
                k->chunk_b[k->n_chunks] = lt + 1;
                k->chunk_cp[k->n_chunks] = 1;
                k->chunk_flags[k->n_chunks] =
                    (uint8_t)(k->link > 0 ? 4 : 0);
                k->n_chunks++;
            }
        }
        pos = lt + 1;
    }
    return 0;
}

/* Batch entry point. Returns 0 on success, -1 on output overflow
 * (caller re-sizes; with chunk arrays >= n_bytes + 2*n_docs and cont
 * arrays >= n_bytes/4 + n_docs it cannot happen). Per doc i:
 *   chunks [i==0 ? 0 : doc_chunk_end[i-1], doc_chunk_end[i])
 *   conts likewise; doc_best[i] = winning container index (global) or -1
 *   doc_fallback[i] = 1 -> rerun this doc in Python. */
long html_extract_batch(const uint8_t *buf, const int64_t *doc_off,
                        long n_docs,
                        int64_t *chunk_a, int64_t *chunk_b,
                        int64_t *chunk_cp, uint8_t *chunk_flags,
                        int64_t *cont_c0, int64_t *cont_c1,
                        int64_t *doc_chunk_end, int64_t *doc_cont_end,
                        int64_t *doc_best, uint8_t *doc_fallback,
                        long max_chunks, long max_conts)
{
    sink_t k;
    k.chunk_a = chunk_a;
    k.chunk_b = chunk_b;
    k.chunk_cp = chunk_cp;
    k.chunk_flags = chunk_flags;
    k.cont_c0 = cont_c0;
    k.cont_c1 = cont_c1;
    k.n_chunks = 0;
    k.n_conts = 0;
    k.max_chunks = max_chunks;
    k.max_conts = max_conts;
    for (long d = 0; d < n_docs; d++) {
        long a = doc_off[d], b = doc_off[d + 1];
        long c_chunk0 = k.n_chunks, c_cont0 = k.n_conts;
        k.skip = 0;
        k.link = 0;
        k.depth = 0;
        k.overflow = 0;
        k.bail = 0;
        int bail = parse_doc(buf + a, b - a, &k) || k.bail;
        if (k.overflow)
            return -1;
        if (bail) {
            k.n_chunks = c_chunk0;
            k.n_conts = c_cont0;
            doc_fallback[d] = 1;
            doc_best[d] = -1;
            doc_chunk_end[d] = k.n_chunks;
            doc_cont_end[d] = k.n_conts;
            continue;
        }
        doc_fallback[d] = 0;
        /* still-open containers end at EOF */
        for (long ci = c_cont0; ci < k.n_conts; ci++)
            if (k.cont_c1[ci] < 0)
                k.cont_c1[ci] = k.n_chunks;
        /* rebase chunk spans to absolute buffer offsets */
        for (long ci = c_chunk0; ci < k.n_chunks; ci++)
            if (!(k.chunk_flags[ci] & 1)) {
                k.chunk_a[ci] += a;
                k.chunk_b[ci] += a;
            }
        /* score: first strictly-max positive container in doc order */
        long best = -1;
        int64_t best_score = 0;
        for (long ci = c_cont0; ci < k.n_conts; ci++) {
            int64_t tot = 0, lnk = 0;
            for (long j2 = k.cont_c0[ci]; j2 < k.cont_c1[ci]; j2++) {
                if (k.chunk_flags[j2] & 1)
                    continue;
                tot += k.chunk_cp[j2];
                if (k.chunk_flags[j2] & 4)
                    lnk += k.chunk_cp[j2];
            }
            int64_t score = tot - 2 * lnk;
            if (score > 0 && (best < 0 || score > best_score)) {
                best = ci;
                best_score = score;
            }
        }
        doc_best[d] = best;
        doc_chunk_end[d] = k.n_chunks;
        doc_cont_end[d] = k.n_conts;
    }
    return 0;
}
