/* Streaming-tokenizer scan loop in C (round-3 spike, VERDICT r2 ask #9).
 *
 * Mirrors html_tokenizer.StreamParser.feed's tokenization EXACTLY,
 * including the malformed-input edge semantics pinned by the goldens:
 *   - '<foo ...' unterminated: '<' dropped, rest is text
 *   - '<>'      : '>' and the rest are text
 *   - '<!...>'  : comment/doctype dropped, trailing text kept
 *   - non-alpha / non-alnum tag names: tag dropped, trailing text kept
 *
 * Input: UTF-8 bytes of one fragment. Output: int32 event quints
 * [type, a0, a1, b0, b1] into a caller-provided buffer:
 *   type 0 = text        a0:a1 = text bounds
 *   type 1 = open tag    a0:a1 = tag bounds, b0:b1 = raw attr bounds
 *   type 2 = close tag   a0:a1 = tag bounds
 *   type 3 = self-closing open tag (bounds as type 1)
 * The input buffer is READ-ONLY (Python passes the original bytes);
 * tag lowercasing happens on the Python-side slices.
 * Returns the number of events written; caller sizes the buffer at
 * 5 * (n/2 + 2) int32s which the event grammar cannot exceed.
 */
#include <stdint.h>

/* python str.strip() whitespace for ASCII: space, \t-\r (0x09-0x0d),
   and the file/group/record/unit separators 0x1c-0x1f (review r3) */
static int is_ws(unsigned char c) {
    return c == ' ' || (c >= 0x09 && c <= 0x0d) || (c >= 0x1c && c <= 0x1f);
}
static int is_alpha(unsigned char c) {
    return (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z');
}
static int is_alnum(unsigned char c) {
    return is_alpha(c) || (c >= '0' && c <= '9');
}

/* ---- fast-paragraph block assembly (round-4 spike, VERDICT r3 #7) ----
 *
 * scan_p handles the kernel's dominant block shape — a self-contained,
 * entity-free <p> whose content is plain text and flat anchors — in ONE
 * C pass, skipping Element objects, regex matching, and piece lists
 * entirely: the paragraph text is assembled directly into a caller
 * buffer and anchors come back as int32 records. The accepted grammar
 * mirrors kernel._FAST_P + _FAST_P_CONTENT + _FAST_A EXACTLY; anything
 * else returns 0 and the caller falls back to the python fast path /
 * tree parser (C-accepted => byte-identical output is pinned by the
 * equivalence property test; C-rejected merely skips the optimization).
 *
 * hdr (int32[8]):  [status, text_len, n_anchors, link_text_len, p_nav]
 * ar  (int32[5*k]): per anchor [t0, t1, h0, h1, flags]; t0/t1 and h0/h1
 *                   are byte bounds in the INPUT (ascii => char bounds);
 *                   h0 = -1 when no href attr parsed.
 *                   flags: 1 = class token "image", 2 = href starts
 *                   with "/wiki" (implies h0 >= 0).
 * out: assembled paragraph text bytes (caller sizes >= n).
 */

static int is_name_start(unsigned char c) {
    return is_alpha(c) || c == '_' || c == ':';
}
static int is_name_char(unsigned char c) {
    return is_alnum(c) || c == '-' || c == '_' || c == ':' || c == '.';
}

/* replica of html_tokenizer._ATTR_RE findall over s[a0:a1), keeping the
 * LAST href / class value bounds (dict construction = last key wins) */
static void parse_attrs_hc(const unsigned char *s, int32_t a0, int32_t a1,
                           int32_t *h0, int32_t *h1,
                           int32_t *c0, int32_t *c1) {
    *h0 = -1; *c0 = -1; *h1 = -1; *c1 = -1;
    int32_t p = a0;
    while (p < a1) {
        if (!is_name_start(s[p])) { p++; continue; }
        int32_t ns = p, ne = p + 1;
        while (ne < a1 && is_name_char(s[ne])) ne++;
        int32_t q = ne;
        while (q < a1 && is_ws(s[q])) q++;
        if (q >= a1 || s[q] != '=') { p++; continue; }
        q++;
        while (q < a1 && is_ws(s[q])) q++;
        if (q >= a1 || s[q] != '"') { p++; continue; }
        int32_t v0 = q + 1, v1 = v0;
        while (v1 < a1 && s[v1] != '"') v1++;
        if (v1 >= a1) { p++; continue; }   /* unterminated value */
        if (ne - ns == 4 && s[ns] == 'h' && s[ns+1] == 'r'
                && s[ns+2] == 'e' && s[ns+3] == 'f') { *h0 = v0; *h1 = v1; }
        else if (ne - ns == 5 && s[ns] == 'c' && s[ns+1] == 'l'
                && s[ns+2] == 'a' && s[ns+3] == 's' && s[ns+4] == 's') {
            *c0 = v0; *c1 = v1;
        }
        p = v1 + 1;
    }
}

/* python `tok in value.split()` on an ascii value: split() whitespace
 * for ascii is exactly is_ws's set */
static int has_token(const unsigned char *s, int32_t v0, int32_t v1,
                     const char *tok, int32_t tl) {
    int32_t i = v0;
    while (i < v1) {
        while (i < v1 && is_ws(s[i])) i++;
        int32_t w0 = i;
        while (i < v1 && !is_ws(s[i])) i++;
        if (i - w0 == tl) {
            int ok = 1;
            for (int32_t k = 0; k < tl; k++)
                if (s[w0 + k] != (unsigned char)tok[k]) { ok = 0; break; }
            if (ok) return 1;
        }
    }
    return 0;
}

int32_t scan_p(const unsigned char *s, int32_t n, int32_t *hdr,
               int32_t *ar, unsigned char *out) {
    hdr[0] = 0;
    if (n < 7 || s[0] != '<' || s[1] != 'p') return 0;
    int32_t i = 2;
    int32_t pc0 = -1, pc1 = -1;
    if (s[i] == '>') {
        i++;
    } else {
        /* _FAST_P: optional (\s+class="...") then '>' — nothing else */
        if (!is_ws(s[i])) return 0;
        while (i < n && is_ws(s[i])) i++;
        if (i + 7 >= n) return 0;
        if (!(s[i] == 'c' && s[i+1] == 'l' && s[i+2] == 'a' && s[i+3] == 's'
              && s[i+4] == 's' && s[i+5] == '=' && s[i+6] == '"')) return 0;
        i += 7;
        pc0 = i;
        /* value excludes <> — the tree tokenizer would split on them */
        while (i < n && s[i] != '"' && s[i] != '<' && s[i] != '>') i++;
        if (i >= n || s[i] != '"') return 0;
        pc1 = i; i++;
        if (i >= n || s[i] != '>') return 0;
        i++;
    }
    if (n - 4 < i) return 0;
    if (!(s[n-4] == '<' && s[n-3] == '/' && s[n-2] == 'p' && s[n-1] == '>'))
        return 0;
    int32_t c1 = n - 4;
    int32_t tl = 0, na = 0, ll = 0;
    while (i < c1) {
        if (s[i] != '<') {                      /* plain text piece */
            int32_t st = i;
            while (i < c1 && s[i] != '<') i++;
            for (int32_t k = st; k < i; k++) out[tl++] = s[k];
            continue;
        }
        /* _FAST_A: <a> or <a\s[^<>]*> then [^<]* then literal </a> */
        if (i + 2 >= c1 || s[i+1] != 'a') return 0;
        int32_t a0, a1;
        int32_t j = i + 2;
        if (s[j] == '>') {
            a0 = a1 = j; j++;
        } else {
            if (!is_ws(s[j])) return 0;         /* '<ax...' is not <a> */
            a0 = j;                             /* rawattrs incl. lead ws */
            while (j < c1 && s[j] != '>' && s[j] != '<') j++;
            if (j >= c1 || s[j] == '<') return 0;
            a1 = j; j++;
        }
        int32_t t0 = j;
        while (j < c1 && s[j] != '<') j++;
        int32_t t1 = j;
        if (j + 4 > c1 || !(s[j] == '<' && s[j+1] == '/' && s[j+2] == 'a'
                            && s[j+3] == '>')) return 0;
        j += 4;
        int32_t h0, h1, cc0, cc1;
        parse_attrs_hc(s, a0, a1, &h0, &h1, &cc0, &cc1);
        int32_t flags = 0;
        if (cc0 >= 0 && has_token(s, cc0, cc1, "image", 5)) flags |= 1;
        if (h0 >= 0 && h1 - h0 >= 5 && s[h0] == '/' && s[h0+1] == 'w'
                && s[h0+2] == 'i' && s[h0+3] == 'k' && s[h0+4] == 'i')
            flags |= 2;
        ar[na*5] = t0; ar[na*5+1] = t1;
        ar[na*5+2] = h0; ar[na*5+3] = h1; ar[na*5+4] = flags;
        na++;
        for (int32_t k = t0; k < t1; k++) out[tl++] = s[k];
        ll += t1 - t0;
        i = j;
    }
    hdr[1] = tl; hdr[2] = na; hdr[3] = ll;
    hdr[4] = (pc0 >= 0 && has_token(s, pc0, pc1, "navbox", 6)) ? 1 : 0;
    hdr[0] = 1;
    return 1;
}

int32_t scan(const unsigned char *s, int32_t n, int32_t *ev) {
    int32_t ne = 0;
    int32_t i = 0;
    /* leading text before the first '<' */
    int32_t start = 0;
    while (i < n && s[i] != '<') i++;
    if (i > start) { ev[ne*5] = 0; ev[ne*5+1] = start; ev[ne*5+2] = i; ne++; }
    while (i < n) {
        /* s[i] == '<' */
        int32_t piece = i + 1;                 /* after '<' */
        /* python tokenizes via fragment.split('<') + part.find('>'):
           the '>' search is bounded by the NEXT '<' */
        int32_t gt = piece;
        while (gt < n && s[gt] != '>' && s[gt] != '<') gt++;
        if (gt >= n || s[gt] == '<') {          /* no '>' in this part:
                                                   '<' dropped, part is text */
            if (gt > piece) { ev[ne*5]=0; ev[ne*5+1]=piece; ev[ne*5+2]=gt; ne++; }
            i = gt;
            continue;
        }
        if (gt == piece) {                      /* '<>' : '>' + rest text */
            int32_t t0 = gt;                    /* include the '>' */
            int32_t t1 = t0 + 1;
            while (t1 < n && s[t1] != '<') t1++;
            ev[ne*5]=0; ev[ne*5+1]=t0; ev[ne*5+2]=t1; ne++;
            i = t1;
            continue;
        }
        int32_t inner0 = piece, inner1 = gt;    /* tag innards bounds */
        int32_t text0 = gt + 1;
        unsigned char c0 = s[inner0];
        if (c0 == '!') {
            /* comment: drop */
        } else if (c0 == '/') {
            /* close tag: strip + lower + isalnum */
            int32_t a = inner0 + 1, b = inner1;
            while (a < b && is_ws(s[a])) a++;
            while (b > a && is_ws(s[b-1])) b--;
            int ok = (b > a);
            for (int32_t k = a; k < b; k++) {
                if (!is_alnum(s[k])) { ok = 0; break; }
            }
            if (ok) {
                ev[ne*5]=2; ev[ne*5+1]=a; ev[ne*5+2]=b; ne++;
            }
        } else {
            int32_t e = inner1;
            int selfclose = (s[e-1] == '/');
            if (selfclose) e--;
            /* find first ' ' (python uses find(" ") — space only) */
            int32_t sp = inner0;
            while (sp < e && s[sp] != ' ') sp++;
            int32_t t_end = sp;                 /* tag = inner[:sp] */
            int32_t a0, a1;
            if (sp < e) { a0 = sp + 1; a1 = e; } else { a0 = a1 = e; }
            /* python: tag.strip() when no space... careful: feed does
               inner.strip() only in the sp==-1 branch. Replicate: */
            int32_t t0 = inner0;
            if (sp >= e) {  /* no space: strip whole inner */
                while (t0 < t_end && is_ws(s[t0])) t0++;
                while (t_end > t0 && is_ws(s[t_end-1])) t_end--;
            }
            int ok = (t_end > t0) && is_alpha(s[t0]);
            if (ok) {
                for (int32_t k = t0; k < t_end; k++) {
                    if (!is_alnum(s[k])) { ok = 0; break; }
                }
            }
            if (ok) {
                ev[ne*5] = selfclose ? 3 : 1;
                ev[ne*5+1]=t0; ev[ne*5+2]=t_end;
                ev[ne*5+3]=a0; ev[ne*5+4]=a1; ne++;
            }
        }
        /* trailing text up to next '<' */
        int32_t t1 = text0;
        while (t1 < n && s[t1] != '<') t1++;
        if (t1 > text0) { ev[ne*5]=0; ev[ne*5+1]=text0; ev[ne*5+2]=t1; ne++; }
        i = t1;
    }
    return ne;
}
