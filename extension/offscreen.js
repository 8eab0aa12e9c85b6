// Offscreen document: captures the chosen tab's audio, plays it back through
// a WebAudio DelayNode, and registers the session with the local
// AudioSyncBridge (hdrtv_tpu/pipeline/bridge.py protocol:
// POST /session/start, POST /session/<id>/keepalive, POST /session/<id>/stop).

const BRIDGE = "http://127.0.0.1:39091";
const KEEPALIVE_MS = 15000; // bridge expires sessions after 45 s idle
const MAX_DELAY_S = 2.0;

const state = {
  ctx: null,
  stream: null,
  delayNode: null,
  sessionId: null,
  keepaliveTimer: 0,
};

async function postJson(path, payload) {
  try {
    const r = await fetch(BRIDGE + path, {
      method: "POST",
      headers: { "Content-Type": "application/json" },
      body: JSON.stringify(payload || {}),
    });
    return { status: r.status, body: await r.json() };
  } catch (e) {
    return { status: 0, body: { ok: false, error: String(e) } };
  }
}

async function startSession(title, url) {
  const res = await postJson("/session/start", {
    title,
    source_url: url,
    browser_name: "chrome",
    has_audio: true,
    audio_sample_rate: state.ctx ? state.ctx.sampleRate : 0,
    audio_channels: 2,
  });
  if (res.body && res.body.ok) {
    state.sessionId = res.body.session_id;
    scheduleKeepalive();
  }
}

function scheduleKeepalive() {
  clearTimeout(state.keepaliveTimer);
  state.keepaliveTimer = setTimeout(async () => {
    if (!state.sessionId) return;
    const res = await postJson(`/session/${state.sessionId}/keepalive`, {
      has_audio: true,
    });
    if (res.status === 410) {
      // revoked app-side: stop delaying (bridge.py revocation contract)
      stopDelay();
      return;
    }
    scheduleKeepalive();
  }, KEEPALIVE_MS);
}

async function startDelay(streamId, delayMs, title, url) {
  stopDelay();
  const stream = await navigator.mediaDevices.getUserMedia({
    audio: {
      mandatory: { chromeMediaSource: "tab", chromeMediaSourceId: streamId },
    },
    video: false,
  });
  const ctx = new AudioContext();
  const src = ctx.createMediaStreamSource(stream);
  const delay = ctx.createDelay(MAX_DELAY_S);
  delay.delayTime.value = Math.min(MAX_DELAY_S, Math.max(0, delayMs / 1000));
  src.connect(delay).connect(ctx.destination);
  state.ctx = ctx;
  state.stream = stream;
  state.delayNode = delay;
  await startSession(title, url);
}

function setDelay(delayMs) {
  if (state.delayNode) {
    state.delayNode.delayTime.value = Math.min(
      MAX_DELAY_S,
      Math.max(0, delayMs / 1000)
    );
  }
}

async function stopDelay() {
  clearTimeout(state.keepaliveTimer);
  if (state.sessionId) {
    postJson(`/session/${state.sessionId}/stop`, {});
    state.sessionId = null;
  }
  if (state.stream) {
    state.stream.getTracks().forEach((t) => t.stop());
    state.stream = null;
  }
  if (state.ctx) {
    state.ctx.close();
    state.ctx = null;
  }
  state.delayNode = null;
}

chrome.runtime.onMessage.addListener((msg) => {
  if (msg.type === "offscreen-start") {
    startDelay(msg.streamId, msg.delayMs, msg.title, msg.url);
  } else if (msg.type === "offscreen-set-delay") {
    setDelay(msg.delayMs);
  } else if (msg.type === "offscreen-stop") {
    stopDelay();
  }
});
