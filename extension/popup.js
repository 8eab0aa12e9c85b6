// Popup: delay slider (0-2000 ms) driving the offscreen DelayNode via the
// service worker; persisted in chrome.storage so reopening keeps the value.

const slider = document.getElementById("delay");
const value = document.getElementById("delay-value");

chrome.storage.local.get({ delayMs: 0 }, ({ delayMs }) => {
  slider.value = delayMs;
  value.textContent = delayMs;
});

slider.addEventListener("input", () => {
  const delayMs = Number(slider.value);
  value.textContent = delayMs;
  chrome.storage.local.set({ delayMs });
  chrome.runtime.sendMessage({ type: "set-delay", delayMs });
});

document.getElementById("start").addEventListener("click", async () => {
  const [tab] = await chrome.tabs.query({ active: true, currentWindow: true });
  chrome.runtime.sendMessage({
    type: "start-delay",
    tabId: tab.id,
    delayMs: Number(slider.value),
  });
});

document.getElementById("stop").addEventListener("click", () => {
  chrome.runtime.sendMessage({ type: "stop-delay" });
});
