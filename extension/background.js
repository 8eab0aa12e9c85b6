// Service worker: owns the offscreen document and relays popup commands.
//
// Counterpart of hdrtv_tpu/pipeline/bridge.py (AudioSyncBridge): the
// offscreen document registers a session with the local bridge and keeps it
// alive; this worker only manages lifecycle (MV3 service workers cannot
// hold an AudioContext themselves).

const OFFSCREEN_URL = "offscreen.html";

async function ensureOffscreen() {
  const has = await chrome.offscreen.hasDocument();
  if (!has) {
    await chrome.offscreen.createDocument({
      url: OFFSCREEN_URL,
      reasons: ["USER_MEDIA"],
      justification: "Capture and delay tab audio for HDR pipeline sync",
    });
  }
}

chrome.runtime.onMessage.addListener((msg, _sender, sendResponse) => {
  (async () => {
    if (msg.type === "start-delay") {
      await ensureOffscreen();
      const streamId = await chrome.tabCapture.getMediaStreamId({
        targetTabId: msg.tabId,
      });
      const tab = await chrome.tabs.get(msg.tabId);
      chrome.runtime.sendMessage({
        type: "offscreen-start",
        streamId,
        delayMs: msg.delayMs,
        title: tab.title || "",
        url: tab.url || "",
      });
      sendResponse({ ok: true });
    } else if (msg.type === "set-delay") {
      chrome.runtime.sendMessage({ type: "offscreen-set-delay", delayMs: msg.delayMs });
      sendResponse({ ok: true });
    } else if (msg.type === "stop-delay") {
      chrome.runtime.sendMessage({ type: "offscreen-stop" });
      sendResponse({ ok: true });
    }
  })();
  return true; // async sendResponse
});
