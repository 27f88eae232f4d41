{{- define "islands-tpu.name" -}}
{{- default .Chart.Name .Values.nameOverride | trunc 63 | trimSuffix "-" -}}
{{- end -}}

{{- define "islands-tpu.serviceAccountName" -}}
{{- if .Values.serviceAccount.create -}}
{{- default (include "islands-tpu.name" .) .Values.serviceAccount.name -}}
{{- else -}}
{{- default "default" .Values.serviceAccount.name -}}
{{- end -}}
{{- end -}}
