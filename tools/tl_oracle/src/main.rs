//! Golden-output generator over the reference crate.
//!
//! stdin:  one test case per line: base64(html) [\t base64(selector)]*
//! stdout: one JSON object per line; all strings are base64-encoded so
//!         no JSON escaping is ever needed.
//!
//! Dumped per case (default ParserOptions):
//!   version, children (top-level handles), per-node
//!   {kind,name,attrs,raw,inner_text,outer_html,boundaries},
//!   dom outer_html, tracked-mode ids/classes maps, and per-selector
//!   document-scope match lists (null when the selector fails to parse).

use std::io::{self, BufRead, Read, Write};

const B64: &[u8; 64] = b"ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/";

fn b64encode(data: &[u8]) -> String {
    let mut out = String::with_capacity((data.len() + 2) / 3 * 4);
    for chunk in data.chunks(3) {
        let b = [
            chunk[0],
            *chunk.get(1).unwrap_or(&0),
            *chunk.get(2).unwrap_or(&0),
        ];
        let n = ((b[0] as u32) << 16) | ((b[1] as u32) << 8) | b[2] as u32;
        out.push(B64[(n >> 18) as usize & 63] as char);
        out.push(B64[(n >> 12) as usize & 63] as char);
        out.push(if chunk.len() > 1 {
            B64[(n >> 6) as usize & 63] as char
        } else {
            '='
        });
        out.push(if chunk.len() > 2 {
            B64[n as usize & 63] as char
        } else {
            '='
        });
    }
    out
}

fn b64decode(s: &str) -> Vec<u8> {
    let mut table = [255u8; 256];
    for (i, &c) in B64.iter().enumerate() {
        table[c as usize] = i as u8;
    }
    let mut out = Vec::new();
    let mut acc: u32 = 0;
    let mut nbits = 0;
    for &c in s.as_bytes() {
        let v = table[c as usize];
        if v == 255 {
            continue; // '=' padding or whitespace
        }
        acc = (acc << 6) | v as u32;
        nbits += 6;
        if nbits >= 8 {
            nbits -= 8;
            out.push((acc >> nbits) as u8);
        }
    }
    out
}

fn q(data: &[u8]) -> String {
    format!("\"{}\"", b64encode(data))
}

fn qs(s: &str) -> String {
    q(s.as_bytes())
}

fn dump_case(html: &str, selectors: &[String]) -> String {
    let dom = tl::parse(html, tl::ParserOptions::default()).unwrap();
    let parser = dom.parser();
    let mut out = String::from("{");

    match dom.version() {
        Some(_) => out.push_str("\"version\":\"HTML5\","),
        None => out.push_str("\"version\":null,"),
    }

    // top-level children handles
    let children: Vec<String> = dom
        .children()
        .iter()
        .map(|h| h.get_inner().to_string())
        .collect();
    out.push_str(&format!("\"children\":[{}],", children.join(",")));

    // node dump
    let mut nodes_json: Vec<String> = Vec::new();
    for node in dom.nodes().iter() {
        let mut nj = String::from("{");
        match node {
            tl::Node::Tag(t) => {
                nj.push_str("\"kind\":0,");
                nj.push_str(&format!("\"name\":{},", q(t.name().as_bytes())));
                let attrs: Vec<String> = t
                    .attributes()
                    .iter()
                    .map(|(k, v)| match v {
                        Some(v) => format!("[{},{}]", qs(&k), qs(&v)),
                        None => format!("[{},null]", qs(&k)),
                    })
                    .collect();
                nj.push_str(&format!("\"attrs\":[{}],", attrs.join(",")));
                nj.push_str(&format!("\"raw\":{},", q(t.raw().as_bytes())));
                let (bs, be) = t.boundaries(parser);
                nj.push_str(&format!("\"boundaries\":[{},{}],", bs, be));
                nj.push_str(&format!(
                    "\"n_children\":{},",
                    t.children().top().len()
                ));
            }
            tl::Node::Raw(r) => {
                nj.push_str("\"kind\":1,");
                nj.push_str(&format!("\"raw\":{},", q(r.as_bytes())));
            }
            tl::Node::Comment(c) => {
                nj.push_str("\"kind\":2,");
                nj.push_str(&format!("\"raw\":{},", q(c.as_bytes())));
            }
        }
        nj.push_str(&format!(
            "\"inner_text\":{},",
            qs(&node.inner_text(parser))
        ));
        nj.push_str(&format!(
            "\"inner_html\":{},",
            qs(&node.inner_html(parser))
        ));
        nj.push_str(&format!(
            "\"outer_html\":{}",
            qs(&node.outer_html(parser))
        ));
        nj.push('}');
        nodes_json.push(nj);
    }
    out.push_str(&format!("\"nodes\":[{}],", nodes_json.join(",")));
    out.push_str(&format!("\"outer_html\":{},", qs(&dom.outer_html())));

    // tracked-mode maps (separate parse: the two modes are different fns)
    let tracked = tl::parse(
        html,
        tl::ParserOptions::default().track_ids().track_classes(),
    )
    .unwrap();
    let tparser = tracked.parser();
    let mut id_entries: Vec<String> = Vec::new();
    let mut class_entries: Vec<String> = Vec::new();
    for node_probe in ["__never__"].iter() {
        let _ = node_probe; // keep loop shape stable
    }
    // probe ids/classes present in the source by re-scanning default dom
    for node in dom.nodes().iter() {
        if let Some(t) = node.as_tag() {
            if let Some(idv) = t.attributes().id() {
                let hit = tracked.get_element_by_id(idv.as_bytes());
                id_entries.push(format!(
                    "[{},{}]",
                    q(idv.as_bytes()),
                    hit.map(|h| h.get_inner().to_string())
                        .unwrap_or_else(|| "null".into())
                ));
            }
            if let Some(citer) = t.attributes().class_iter() {
                for cls in citer {
                    let hits: Vec<String> = tracked
                        .get_elements_by_class_name(cls)
                        .map(|h| h.get_inner().to_string())
                        .collect();
                    class_entries.push(format!(
                        "[{},[{}]]",
                        qs(cls),
                        hits.join(",")
                    ));
                }
            }
        }
    }
    let _ = tparser;
    out.push_str(&format!("\"ids_tracked\":[{}],", id_entries.join(",")));
    out.push_str(&format!(
        "\"classes_tracked\":[{}],",
        class_entries.join(",")
    ));

    // selector queries (document scope, default-options dom)
    let mut sel_json: Vec<String> = Vec::new();
    for sel in selectors {
        match dom.query_selector(sel) {
            Some(iter) => {
                let hits: Vec<String> =
                    iter.map(|h| h.get_inner().to_string()).collect();
                sel_json.push(format!("[{}]", hits.join(",")));
            }
            None => sel_json.push("null".into()),
        }
    }
    out.push_str(&format!("\"selectors\":[{}],", sel_json.join(",")));

    // tag-scope selector queries from the FIRST tag node (subtree slice
    // semantics, src/queryselector/iterable.rs:50-77)
    let first_tag = dom.nodes().iter().find_map(|n| n.as_tag());
    let mut tag_sel_json: Vec<String> = Vec::new();
    if let Some(tag) = first_tag {
        for sel in selectors {
            match tag.query_selector(parser, sel) {
                Some(iter) => {
                    let hits: Vec<String> =
                        iter.map(|h| h.get_inner().to_string()).collect();
                    tag_sel_json.push(format!("[{}]", hits.join(",")));
                }
                None => tag_sel_json.push("null".into()),
            }
        }
    }
    out.push_str(&format!(
        "\"tag_selectors\":[{}]",
        tag_sel_json.join(",")
    ));
    out.push('}');
    out
}

fn bench_mode() {
    // stdin: base64 docs, one per line. Parses the whole corpus 5x
    // (default ParserOptions + inner_text of top-level nodes, i.e. the
    // same work our extraction kernel does) and prints docs/s + MB/s.
    let stdin = io::stdin();
    let mut input = String::new();
    stdin.lock().read_to_string(&mut input).unwrap();
    let docs: Vec<String> = input
        .lines()
        .filter(|l| !l.is_empty())
        .map(|l| String::from_utf8_lossy(&b64decode(l)).into_owned())
        .collect();
    let total_bytes: usize = docs.iter().map(|d| d.len()).sum();
    let reps = 5;
    let start = std::time::Instant::now();
    let mut sink = 0usize;
    for _ in 0..reps {
        for d in &docs {
            let dom = tl::parse(d, tl::ParserOptions::default()).unwrap();
            let parser = dom.parser();
            for h in dom.children() {
                let node = h.get(parser).unwrap();
                sink += node.inner_text(parser).len();
            }
        }
    }
    let secs = start.elapsed().as_secs_f64();
    let n = docs.len() * reps;
    println!(
        "{{\"docs_per_sec\": {:.1}, \"mb_per_sec\": {:.2}, \"sink\": {}}}",
        n as f64 / secs,
        (total_bytes * reps) as f64 / secs / 1e6,
        sink
    );
}

fn bench_selector_mode(selector: &str) {
    // stdin: base64 docs. Parses the corpus 5x and runs a
    // document-scope query_selector + inner_text of every match —
    // the same work as the engine's selector-extraction kernel.
    let stdin = io::stdin();
    let mut input = String::new();
    stdin.lock().read_to_string(&mut input).unwrap();
    let docs: Vec<String> = input
        .lines()
        .filter(|l| !l.is_empty())
        .map(|l| String::from_utf8_lossy(&b64decode(l)).into_owned())
        .collect();
    let total_bytes: usize = docs.iter().map(|d| d.len()).sum();
    let reps = 5;
    let start = std::time::Instant::now();
    let mut sink = 0usize;
    let mut matches = 0usize;
    for _ in 0..reps {
        for d in &docs {
            let dom = tl::parse(d, tl::ParserOptions::default()).unwrap();
            let parser = dom.parser();
            if let Some(it) = dom.query_selector(selector) {
                for h in it {
                    let node = h.get(parser).unwrap();
                    sink += node.inner_text(parser).len();
                    matches += 1;
                }
            }
        }
    }
    let secs = start.elapsed().as_secs_f64();
    let n = docs.len() * reps;
    println!(
        "{{\"docs_per_sec\": {:.1}, \"mb_per_sec\": {:.2}, \"matches\": {}, \"sink\": {}}}",
        n as f64 / secs,
        (total_bytes * reps) as f64 / secs / 1e6,
        matches,
        sink
    );
}

fn main() {
    let args: Vec<String> = std::env::args().collect();
    if let Some(i) = args.iter().position(|a| a == "--bench-selector") {
        let sel = args.get(i + 1).map(|s| s.as_str()).unwrap_or("p");
        bench_selector_mode(sel);
        return;
    }
    if std::env::args().any(|a| a == "--bench") {
        bench_mode();
        return;
    }
    let stdin = io::stdin();
    let mut input = String::new();
    stdin.lock().read_to_string(&mut input).unwrap();
    let stdout = io::stdout();
    let mut w = stdout.lock();
    for line in input.lines() {
        if line.is_empty() {
            continue;
        }
        let mut parts = line.split('\t');
        let html_b = b64decode(parts.next().unwrap());
        let html = String::from_utf8_lossy(&html_b).into_owned();
        let selectors: Vec<String> = parts
            .map(|p| String::from_utf8_lossy(&b64decode(p)).into_owned())
            .collect();
        let json = dump_case(&html, &selectors);
        writeln!(w, "{}", json).unwrap();
    }
}
