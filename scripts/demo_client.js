#!/usr/bin/env -S node --experimental-websocket
// Headless driver for the CdcWebDemo page: fetches static/index.html
// from the running demo, executes its REAL inline script under a
// minimal DOM shim, and connects through node's browser-grade
// WebSocket (undici, RFC 6455) — i.e. everything a browser does short
// of pixels. Prints one JSON state line per second:
//   {"status":...,"nrows":...,"nevents":...,"rows":[{id,username,message},...]}
// rows are in DOM order, so the page's newest-create_time-first (R5)
// presentation is observable and assertable from the outside.
//
// Usage: node --experimental-websocket scripts/demo_client.js <httpUrl> [seconds]
// (No Chrome in this environment — this is the demo's e2e harness.)
"use strict";
const vm = require("vm");

const base = process.argv[2] || "http://127.0.0.1:8080/";
const seconds = parseInt(process.argv[3] || "15", 10);

function makeElement(tag) {
  return {
    tagName: tag,
    textContent: "",
    className: "",
    dataset: {},
    style: {},
    children: [],
    append(...kids) { this.children.push(...kids); },
    replaceChildren(...kids) { this.children = kids; },
    addEventListener() {},
  };
}

async function main() {
  const html = await (await fetch(base)).text();
  const m = html.match(/<script>([\s\S]*?)<\/script>/);
  if (!m) { console.error("no inline script in page"); process.exit(2); }

  const ids = {};
  for (const id of ["status", "stats", "nrows", "nevents", "reconnect", "view", "empty"])
    ids[id] = makeElement(id === "view" ? "ul" : "span");

  const u = new URL(base);
  const sandbox = {
    document: {
      getElementById: (id) => ids[id],
      createElement: (tag) => makeElement(tag),
    },
    location: { hostname: u.hostname },
    fetch: (path) => fetch(new URL(path, base)),
    WebSocket,
    URL,
    Date,
    JSON,
    console,
    setTimeout,
  };
  vm.createContext(sandbox);
  vm.runInContext(m[1], sandbox);

  const tick = () => {
    const rows = ids.view.children.map((li) => ({
      id: li.dataset.id,
      username: (li.children[0] || {}).textContent,
      message: (li.children[2] || {}).textContent,
    }));
    console.log(JSON.stringify({
      status: ids.status.textContent,
      nrows: ids.nrows.textContent,
      nevents: ids.nevents.textContent,
      rows,
    }));
  };
  const iv = setInterval(tick, 1000);
  setTimeout(() => { clearInterval(iv); tick(); process.exit(0); }, seconds * 1000);
}

main().catch((e) => { console.error(e); process.exit(1); });
