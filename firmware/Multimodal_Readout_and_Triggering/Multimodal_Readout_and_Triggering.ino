/*
 * Multimodal readout + hardware-trigger firmware (Teensy 4.1).
 *
 * Role (SURVEY.md L0): free-running readout of three analog sensors —
 * force (FSR/dynamometer), ECG and GSR — streamed over USB serial as the
 * line protocol consumed by mba_tpu's native serial shim:
 *
 *     FSR:<volts>\nECG:<volts>\nGSR:<volts>\n        @ 115200 baud
 *
 * Serial commands 'A'/'B' set/clear the TRIG pin, which feeds the OTB
 * Quattrocento's trigger input so the EEG/EMG recording clock can be
 * anchored to the experiment log (data_integration.
 * get_qtc_measurement_start_end).  Heartbeat LED blinks at 1 Hz.
 */

const int FSR_PIN = A10;
const int ECG_PIN = A2;
const int GSR_PIN = A4;
const int TRIG_PIN = 32;
const int LED_PIN = LED_BUILTIN;

const float ADC_REF_VOLTS = 3.3f;
const float ADC_MAX = 1023.0f;

unsigned long lastBlinkMs = 0;
bool ledState = false;

void setup() {
  Serial.begin(115200);
  pinMode(TRIG_PIN, OUTPUT);
  pinMode(LED_PIN, OUTPUT);
  digitalWrite(TRIG_PIN, LOW);
}

void loop() {
  // 1 Hz heartbeat LED
  unsigned long now = millis();
  if (now - lastBlinkMs >= 500) {
    ledState = !ledState;
    digitalWrite(LED_PIN, ledState ? HIGH : LOW);
    lastBlinkMs = now;
  }

  // trigger commands from the host sampling process
  while (Serial.available() > 0) {
    char cmd = Serial.read();
    if (cmd == 'A') {
      digitalWrite(TRIG_PIN, HIGH);
    } else if (cmd == 'B') {
      digitalWrite(TRIG_PIN, LOW);
    }
  }

  // sensor readout -> volts -> line protocol
  float fsr = analogRead(FSR_PIN) * ADC_REF_VOLTS / ADC_MAX;
  float ecg = analogRead(ECG_PIN) * ADC_REF_VOLTS / ADC_MAX;
  float gsr = analogRead(GSR_PIN) * ADC_REF_VOLTS / ADC_MAX;

  Serial.print("FSR:");
  Serial.println(fsr, 4);
  Serial.print("ECG:");
  Serial.println(ecg, 4);
  Serial.print("GSR:");
  Serial.println(gsr, 4);
}
